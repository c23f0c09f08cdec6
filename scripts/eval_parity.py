"""Device-vs-host eval-driver parity: per-episode agreement + divergence.

The study's headline curves ride the fused on-device evaluator (float32
polyline sim compiled into the rollout, eval/ondevice.py); the float64 host
driver (eval/evaluator.py _run_rollout*) is the reference implementation.
Round 4 bounded their disagreement with a single 4-episode host row — a
caveat, not a bound (VERDICT r4 weak #3 / next #4).  This script computes
the real thing from EVAL.DUMP_TRAJECTORIES traces: same checkpoint, same
episodes, both drivers, then

* per-episode success agreement (the study's scored quantity),
* trajectory divergence: per-step position delta over the common prefix,
  its max, and the first step exceeding 0.1 m,
* final-position delta.

Usage:
  python scripts/eval_parity.py ARM_DIR [--ckpt NAME|best]
      [--device-dir tb_eval/val_unseen] [--host-dir tb_eval/<host label>]
      [--eval-every 4]

The host traces come from a CS_ONLY_CKPT=<best> CS_HOST=1 CS_ROWS_TAG=parity
stage_eval pass (scripts/convergence_study.py) pinned to JAX_PLATFORMS=cpu;
the device traces from the arm's normal on-device eval pass.  No jax here —
pure file comparison.
"""

import argparse
import json
import math
import os
import sys


def load_traces(path):
    rows = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            # later rows win (re-runs append)
            rows[(r["episode_id"], r["ckpt_index"])] = r
    return rows


def pick_checkpoints(names, eval_every):
    """Mirror of scripts/convergence_study.py pick_checkpoints."""
    picked = names[eval_every - 1::eval_every]
    if names and (not picked or picked[0] != names[0]):
        picked.insert(0, names[0])
    if names and picked[-1] != names[-1]:
        picked.append(names[-1])
    return picked


def ckpt_names(folder):
    out = []
    for name in os.listdir(folder):
        if name.startswith("ckpt."):
            try:
                out.append((int(name.split(".")[1]), name))
            except ValueError:
                continue
    return [n for _, n in sorted(out)]


def best_ckpt(arm, split="val_unseen"):
    path = os.path.join(arm, f"convergence_{split}.jsonl")
    rows = []
    with open(path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    rows = [r for r in rows if r.get("success") is not None]
    if not rows:
        raise SystemExit(f"no success rows in {path}")
    return max(rows, key=lambda r: (float(r["success"]),
                                    -r.get("epoch", 0)))["ckpt"]


def dist(a, b):
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def compare(dev, host):
    """Per-episode divergence stats for one (device, host) trace pair."""
    dl, hl = dev["locations"], host["locations"]
    n = min(len(dl), len(hl))
    deltas = [dist(dl[i], hl[i]) for i in range(n)]
    first_01 = next((i for i, d in enumerate(deltas) if d > 0.1), None)
    return {
        "episode_id": dev["episode_id"],
        "steps_device": len(dl) - 1,
        "steps_host": len(hl) - 1,
        "success_device": dev["success"],
        "success_host": host["success"],
        "agree": dev["success"] == host["success"],
        "max_delta": max(deltas) if deltas else float("nan"),
        "first_step_gt_0.1m": first_01,
        "final_delta": dist(dl[-1], hl[-1]),
        "ndtw_device": dev.get("ndtw"),
        "ndtw_host": host.get("ndtw"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arm")
    ap.add_argument("--ckpt", default="best")
    ap.add_argument("--device-dir", default="tb_eval/val_unseen")
    ap.add_argument("--host-dir", default="tb_eval/val_unseen_host_parity")
    ap.add_argument("--eval-every", type=int, default=4)
    args = ap.parse_args()

    ckpt = args.ckpt
    if ckpt == "best":
        ckpt = best_ckpt(args.arm)
    picked = pick_checkpoints(ckpt_names(os.path.join(args.arm, "ckpts")),
                              args.eval_every)
    if ckpt not in picked:
        raise SystemExit(f"{ckpt} not among evaluated checkpoints {picked}")
    dev_idx = picked.index(ckpt)

    dev = load_traces(os.path.join(args.arm, args.device_dir,
                                   "trajectories.jsonl"))
    host = load_traces(os.path.join(args.arm, args.host_dir,
                                    "trajectories.jsonl"))
    dev = {eid: r for (eid, ci), r in dev.items() if ci == dev_idx}
    # the host parity pass evaluates ONE checkpoint -> its index is 0
    host = {eid: r for (eid, ci), r in host.items()}
    shared = sorted(set(dev) & set(host))
    if not shared:
        raise SystemExit(
            f"no shared episodes (device has {len(dev)} at index {dev_idx}, "
            f"host has {len(host)})"
        )

    rows = [compare(dev[eid], host[eid]) for eid in shared]
    agree = sum(r["agree"] for r in rows)
    print(f"### Device-vs-host eval parity — {os.path.basename(args.arm)}, "
          f"{ckpt}, {len(rows)} shared val_unseen episodes\n")
    print(f"* success agreement: **{agree}/{len(rows)}**")
    both = [r for r in rows]
    mx = max(r["max_delta"] for r in both)
    fin = sum(r["final_delta"] for r in both) / len(both)
    print(f"* max per-step position delta over any episode: **{mx:.3f} m**")
    print(f"* mean final-position delta: **{fin:.3f} m**")
    diverged = [r for r in rows if r["first_step_gt_0.1m"] is not None]
    print(f"* episodes whose paths ever diverged >0.1 m: "
          f"{len(diverged)}/{len(rows)}"
          + (f" (earliest at step "
             f"{min(r['first_step_gt_0.1m'] for r in diverged)})"
             if diverged else ""))
    print("\n| episode | steps dev/host | success dev/host | max delta (m) "
          "| first >0.1m | final delta (m) | ndtw dev/host |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['episode_id']} | {r['steps_device']}/{r['steps_host']} "
            f"| {r['success_device']:.0f}/{r['success_host']:.0f} "
            f"| {r['max_delta']:.3f} | {r['first_step_gt_0.1m']} "
            f"| {r['final_delta']:.3f} "
            f"| {r['ndtw_device']:.3f}/{r['ndtw_host']:.3f} |"
        )
    if agree < len(rows):
        print("\nDisagreement present: treat the host f64 driver as the "
              "scoring path and the on-device evaluator as a speed screen.",
              file=sys.stderr)


if __name__ == "__main__":
    main()
