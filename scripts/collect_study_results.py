"""Merge convergence-study outputs into the committed quality report.

Reads every ``convergence_*.jsonl`` under the given study output dirs (one
per model family, produced by scripts/convergence_study.py), renders the
combined per-epoch closed-loop metric table, and computes the headline
comparisons the study exists to answer (VERDICT r3 next #1/#2):

* does val_unseen success/SPL/nDTW improve with training, per family;
* the family ordering at the final epoch (paper: HCM >= flat,
  reference README.md:236-239);
* the language-grounding control: best-checkpoint val_unseen vs the same
  checkpoint with shuffled instructions vs the RandomAgent baseline.

Usage: python scripts/collect_study_results.py OUT1 [OUT2 ...] > report.md
"""

import glob
import json
import os
import sys

COLS = ["success", "spl", "ndtw", "navigation_error", "path_length"]


def load_rows(out_dirs):
    rows = []
    for d in out_dirs:
        for path in sorted(glob.glob(os.path.join(d, "convergence_*.jsonl"))):
            if path.endswith("convergence.jsonl"):
                continue
            with open(path) as f:
                rows += [json.loads(l) for l in f if l.strip()]
    return rows


def table(rows):
    out = ["| model | split | epoch | " + " | ".join(COLS) + " |",
           "|---|---|---|" + "---|" * len(COLS)]
    for r in sorted(rows, key=lambda r: (r.get("model", "?"), r["split"],
                                         r["epoch"])):
        out.append(
            f"| {r.get('model', '?')} | {r['split']} | {r['epoch']} | "
            + " | ".join(str(r.get(c, "—")) for c in COLS) + " |"
        )
    return "\n".join(out)


def _final(rows, model, split):
    cand = [r for r in rows if r.get("model") == model and r["split"] == split]
    return max(cand, key=lambda r: r["epoch"]) if cand else None


def _first(rows, model, split):
    cand = [r for r in rows if r.get("model") == model and r["split"] == split]
    return min(cand, key=lambda r: r["epoch"]) if cand else None


def summary(rows):
    models = sorted({r["model"] for r in rows
                     if not r["model"].startswith("nonlearning")})
    lines = []
    lines.append("### Learning (first -> final epoch, val_unseen)\n")
    lines.append("| model | success | spl | ndtw |")
    lines.append("|---|---|---|---|")
    for m in models:
        f0, f1 = _first(rows, m, "val_unseen"), _final(rows, m, "val_unseen")
        if not (f0 and f1):
            continue
        lines.append(
            f"| {m} | {f0.get('success')} -> {f1.get('success')} "
            f"| {f0.get('spl')} -> {f1.get('spl')} "
            f"| {f0.get('ndtw')} -> {f1.get('ndtw')} |"
        )
    lines.append("\n### Grounding control (final checkpoint, val_unseen)\n")
    lines.append("| model | condition | success | spl | ndtw |")
    lines.append("|---|---|---|---|---|")
    for m in models:
        for split, label in (
            ("val_unseen", "true instructions"),
            ("val_unseen_shuffled", "shuffled instructions"),
        ):
            r = _final(rows, m, split)
            if r:
                lines.append(
                    f"| {m} | {label} | {r.get('success')} | {r.get('spl')} "
                    f"| {r.get('ndtw')} |"
                )
    nl = [r for r in rows if r["model"].startswith("nonlearning")]
    for r in nl:
        label = ("expert upper bound"
                 if "Expert" in r["model"] else "random baseline")
        lines.append(
            f"| {r['model']} | {label} | {r.get('success')} "
            f"| {r.get('spl')} | {r.get('ndtw')} |"
        )
    host = [r for r in rows if r["split"] == "val_unseen_host"]
    if host:
        lines.append("\n### Host-driver cross-check (final checkpoint)\n")
        lines.append("| model | driver | success | spl | ndtw |")
        lines.append("|---|---|---|---|---|")
        for r in host:
            m = r["model"]
            dev = _final(rows, m, "val_unseen")
            if dev:
                lines.append(
                    f"| {m} | on-device f32 sim | {dev.get('success')} "
                    f"| {dev.get('spl')} | {dev.get('ndtw')} |"
                )
            lines.append(
                f"| {m} | host f64 driver | {r.get('success')} "
                f"| {r.get('spl')} | {r.get('ndtw')} |"
            )
    return "\n".join(lines)


def main():
    dirs = sys.argv[1:]
    if not dirs:
        raise SystemExit("usage: collect_study_results.py OUT_DIR [...]")
    rows = load_rows(dirs)
    if not rows:
        raise SystemExit(f"no convergence_*.jsonl rows under {dirs}")
    print(summary(rows))
    print("\n### Full per-epoch table\n")
    print(table(rows))


if __name__ == "__main__":
    main()
