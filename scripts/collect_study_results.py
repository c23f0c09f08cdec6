"""Merge convergence-study outputs into the committed quality report.

Reads every ``convergence_*.jsonl`` under the given study output dirs (one
per model family / arm, produced by scripts/convergence_study.py), renders
the combined per-epoch closed-loop metric table, and computes the headline
comparisons the study exists to answer (VERDICT r3 next #1/#2, r4 next
#3/#5/#6):

* does val_unseen success/SPL/nDTW improve with training, per family;
* BEST-checkpoint rows per family (the reference's protocol: its eval
  daemon sweeps every checkpoint and the paper reports the best —
  reference README.md:209) with the epoch noted;
* the language-grounding control: best-checkpoint val_unseen vs the same
  checkpoint with shuffled instructions vs the RandomAgent baseline;
* Wilson 95% intervals next to every success rate (rows carry their
  episode count), so no claim rests on an unquantified noise band.

Row hygiene: duplicate rows (same model/split/ckpt — e.g. the nonlearning
baselines re-run once per arm dir) are deduped; when the same checkpoint
was re-evaluated at higher power (CS_ROWS_TAG=nNN eval passes write
``convergence_<split>_nNN.jsonl``), the row with the most episodes wins.
A listed arm dir with no rows is an error, not a silent omission.

Usage: python scripts/collect_study_results.py OUT1 [OUT2 ...] > report.md
"""

import glob
import json
import math
import os
import re
import sys

COLS = ["success", "spl", "ndtw", "navigation_error", "path_length"]
_TAG = re.compile(r"_n\d+$")


def base_split(split: str) -> str:
    """Strip a re-power tag: 'val_unseen_n48' -> 'val_unseen'."""
    return _TAG.sub("", split)


def wilson(p, n, z=1.96):
    """Wilson score interval for a binomial rate p measured over n trials."""
    if not n:
        return None
    denom = 1.0 + z * z / n
    centre = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return max(centre - half, 0.0), min(centre + half, 1.0)


def fisher_greater(k1, n1, k2, n2):
    """One-sided Fisher exact test P(successes_1 >= k1 | margins fixed)
    under the null of equal rates — the hypergeometric upper tail,
    dependency-free via math.comb.  Used for the grounding claim
    (true-instruction successes vs shuffled-instruction successes at the
    same checkpoint)."""
    K = k1 + k2
    denom = math.comb(n1 + n2, K)
    return sum(
        math.comb(n1, k) * math.comb(n2, K - k)
        for k in range(k1, min(n1, K) + 1)
    ) / denom


def _successes(r):
    """(success count, episode count) for a row that knows its N."""
    n, v = r.get("episodes"), r.get("success")
    if not n or v is None:
        return None
    return int(round(float(v) * n)), int(n)


def fmt_rate(r, col="success"):
    """'0.29 [0.13, 0.51]/24' when the row knows its episode count."""
    v = r.get(col)
    if v is None:
        return "—"
    n = r.get("episodes")
    ci = wilson(float(v), n) if n else None
    if ci is None:
        return str(v)
    return f"{v} [{ci[0]:.2f}, {ci[1]:.2f}]/{n}"


def load_rows(out_dirs):
    rows = []
    for d in out_dirs:
        paths = [p for p in sorted(glob.glob(
            os.path.join(d, "convergence_*.jsonl")))
            if not p.endswith(os.sep + "convergence.jsonl")]
        if not paths:
            raise SystemExit(
                f"arm dir {d!r} has no convergence_*.jsonl rows — "
                "missing or unfinished arm (refusing to silently omit it)"
            )
        for path in paths:
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    r = json.loads(line)
                    r["arm"] = os.path.basename(os.path.normpath(d))
                    rows.append(r)
    return dedup(rows)


def dedup(rows):
    """One row per (arm, model, base split, ckpt, epoch); most episodes wins
    so re-powered eval passes supersede the original low-power rows.  Epoch
    rides in the key so legacy rows without a ckpt name stay distinct."""
    best = {}
    for i, r in enumerate(rows):
        r = dict(r)
        r["split"] = base_split(r.get("split", "?"))
        key = (r.get("arm"), r.get("model", "?"), r["split"],
               r.get("ckpt"), r.get("epoch"))
        prev = best.get(key)
        # ties -> later row wins (files are read in sorted order; re-eval
        # appends later)
        if prev is None or r.get("episodes", 0) >= prev[1].get("episodes", 0):
            best[key] = (i, r)
    return [r for _, r in sorted(best.values(), key=lambda t: t[0])]


def table(rows):
    out = ["| arm | model | split | epoch | " + " | ".join(COLS) + " |",
           "|---|---|---|---|" + "---|" * len(COLS)]
    for r in sorted(rows, key=lambda r: (r.get("arm", "?"),
                                         r.get("model", "?"),
                                         r.get("split", "?"),
                                         r.get("epoch", -1))):
        out.append(
            f"| {r.get('arm', '?')} | {r.get('model', '?')} "
            f"| {r.get('split', '?')} | {r.get('epoch', '?')} | "
            + " | ".join(
                fmt_rate(r, c) if c == "success" else str(r.get(c, "—"))
                for c in COLS
            ) + " |"
        )
    return "\n".join(out)


def _rows_of(rows, arm, model, split):
    return [r for r in rows if r.get("arm") == arm
            and r.get("model") == model and r.get("split") == split]


def _final(rows, arm, model, split):
    cand = _rows_of(rows, arm, model, split)
    return max(cand, key=lambda r: r.get("epoch", -1)) if cand else None


def _first(rows, arm, model, split):
    cand = _rows_of(rows, arm, model, split)
    return min(cand, key=lambda r: r.get("epoch", -1)) if cand else None


def _best(rows, arm, model, split, col="success"):
    """Best checkpoint by `col` (ties -> earliest epoch, the less
    overfitted one)."""
    cand = [r for r in _rows_of(rows, arm, model, split)
            if r.get(col) is not None]
    return max(cand, key=lambda r: (float(r[col]), -r.get("epoch", 0))) \
        if cand else None


def _at_epoch(rows, arm, model, split, epoch):
    for r in _rows_of(rows, arm, model, split):
        if r.get("epoch") == epoch:
            return r
    return None


def _learned(rows):
    """(arm, model) pairs with a learned val_unseen curve."""
    pairs = []
    for r in rows:
        m = r.get("model", "?")
        if m.startswith("nonlearning"):
            continue
        key = (r.get("arm", "?"), m)
        if key not in pairs and r.get("split") == "val_unseen":
            pairs.append(key)
    return sorted(pairs)


def summary(rows):
    lines = []
    lines.append("### Learning (first -> final epoch, val_unseen)\n")
    lines.append("| arm | model | success | spl | ndtw |")
    lines.append("|---|---|---|---|---|")
    for arm, m in _learned(rows):
        f0 = _first(rows, arm, m, "val_unseen")
        f1 = _final(rows, arm, m, "val_unseen")
        if not (f0 and f1):
            continue
        lines.append(
            f"| {arm} | {m} | {f0.get('success')} -> {f1.get('success')} "
            f"| {f0.get('spl')} -> {f1.get('spl')} "
            f"| {f0.get('ndtw')} -> {f1.get('ndtw')} |"
        )

    lines.append(
        "\n### Best checkpoint (val_unseen; reference protocol — the eval"
        "\ndaemon sweeps every checkpoint and the best is reported,"
        " README.md:209)\n"
    )
    lines.append("| arm | model | best epoch | success (95% CI) | spl "
                 "| ndtw |")
    lines.append("|---|---|---|---|---|---|")
    for arm, m in _learned(rows):
        b = _best(rows, arm, m, "val_unseen")
        if not b:
            continue
        lines.append(
            f"| {arm} | {m} | {b.get('epoch')} | {fmt_rate(b)} "
            f"| {b.get('spl')} | {b.get('ndtw')} |"
        )

    lines.append("\n### Grounding control (best val_unseen checkpoint vs "
                 "the SAME epoch shuffled, plus baselines)\n")
    lines.append("| arm | model | condition | epoch | success (95% CI) "
                 "| spl | ndtw | Fisher p (one-sided, true>this) |")
    lines.append("|---|---|---|---|---|---|---|---|")
    for arm, m in _learned(rows):
        b = _best(rows, arm, m, "val_unseen")
        if not b:
            continue
        lines.append(
            f"| {arm} | {m} | true instructions | {b.get('epoch')} "
            f"| {fmt_rate(b)} | {b.get('spl')} | {b.get('ndtw')} | — |"
        )
        s = _at_epoch(rows, arm, m, "val_unseen_shuffled", b.get("epoch")) \
            or _final(rows, arm, m, "val_unseen_shuffled")
        if s:
            kb, ks = _successes(b), _successes(s)
            if kb and ks:
                pv = fisher_greater(kb[0], kb[1], ks[0], ks[1])
                p = f"{pv:.2e}" if pv < 1e-3 else f"{pv:.4f}"
            else:
                p = "—"
            lines.append(
                f"| {arm} | {m} | shuffled instructions | {s.get('epoch')} "
                f"| {fmt_rate(s)} | {s.get('spl')} | {s.get('ndtw')} "
                f"| {p} |"
            )
    seen = set()
    for r in rows:
        m = r.get("model", "?")
        if not m.startswith("nonlearning") or m in seen:
            continue
        seen.add(m)
        label = ("expert upper bound" if "Expert" in m
                 else "random baseline")
        lines.append(
            f"| — | {m} | {label} | — | {fmt_rate(r)} "
            f"| {r.get('spl')} | {r.get('ndtw')} | — |"
        )

    host = [r for r in rows if r.get("split") == "val_unseen_host"]
    if host:
        lines.append("\n### Host-driver cross-check (final checkpoint)\n")
        lines.append("| arm | model | driver | success | spl | ndtw |")
        lines.append("|---|---|---|---|---|---|")
        for r in host:
            arm, m = r.get("arm", "?"), r.get("model", "?")
            dev = _final(rows, arm, m, "val_unseen")
            if dev:
                lines.append(
                    f"| {arm} | {m} | on-device f32 sim | {fmt_rate(dev)} "
                    f"| {dev.get('spl')} | {dev.get('ndtw')} |"
                )
            lines.append(
                f"| {arm} | {m} | host f64 driver | {fmt_rate(r)} "
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
