#!/usr/bin/env python3
"""Host input-pipeline throughput at REAL shapes (VERDICT r2 #2).

Measures whether the host can feed the device: the device does ~2184
frames/s/chip on the IL train step (BENCH_r02), and the reference ships a
single-worker DataLoader (robo_vln_trainer.py:919-927) whose collate
materializes float32 images.  This benchmark builds a trajectory buffer at
production shapes (rgb 224x224x3, depth 256x256x1, T=100 windows), then
measures steady-state decode+collate frames/s for:

  * the production pipeline (uint8 rgb / f16 depth in the buffer AND through
    collate — data/loader.SENSOR_DTYPES), and
  * the reference-style pipeline (float images in the buffer, float32
    collate) on a smaller sample, for the speedup claim.

Prints one JSON line per measurement and a summary line.  Run:

    python benchmarks/input_pipeline.py [--episodes 8] [--t 100]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from robo_vln_tpu.data.loader import (
    SENSOR_DTYPES,
    TrajectoryDataset,
    batch_iterator,
    write_episode,
)
from robo_vln_tpu.data.trajectory_store import TrajectoryStore

RGB_HW, DEPTH_HW, INSTR_LEN = 224, 256, 200


def _episode(rng, t, legacy_f64=False, features=False):
    if features:
        # feature-store layout (training/featurize.py): f16 trunk outputs +
        # the per-episode frozen-BERT row instead of raw frames
        obs = {
            "rgb_features": rng.standard_normal((t, 7, 7, 2048)).astype(
                np.float16
            ),
            "depth_features": rng.standard_normal((t, 8, 8, 32)).astype(
                np.float16
            ),
            "instruction_embedding": rng.standard_normal(
                (INSTR_LEN, 768)
            ).astype(np.float16),
        }
    else:
        obs = {
            "rgb": rng.integers(0, 255, (t, RGB_HW, RGB_HW, 3)).astype(
                np.float64 if legacy_f64 else SENSOR_DTYPES["rgb"]
            ),
            "depth": rng.random((t, DEPTH_HW, DEPTH_HW, 1)).astype(
                np.float64 if legacy_f64 else SENSOR_DTYPES["depth"]
            ),
        }
    obs.update({
        "progress": np.linspace(0, 1, t).astype(np.float32),
        "vln_oracle_action_sensor": rng.integers(1, 4, (t, 1)).astype(np.float32),
        "instruction": np.tile(
            rng.integers(1, 3000, (1, INSTR_LEN)).astype(np.float32), (t, 1)
        ),
    })
    prev = rng.random((t, 2))
    corr = rng.random((t, 2))
    return obs, prev, corr, [t - 2] * t


def build_buffer(path, n_eps, t, legacy_f64=False, seed=0, features=False):
    rng = np.random.default_rng(seed)
    with TrajectoryStore(path, writable=True) as store:
        for k in range(n_eps):
            # feature stores are written in the flat wire format in
            # production (training/featurize.py) — decode is zero-copy
            write_episode(
                store, k, *_episode(rng, t, legacy_f64, features),
                flat=features,
            )
        store.flush()


def measure_loader_fps(path, batch_size, t, n_eps, warm_batches=1,
                       workers=0):
    """Steady-state decode+collate frames/s over one full pass.

    workers>1 measures the process-parallel shared-memory loader
    (data/parallel_loader.py, DAGGER.LOADER_WORKERS)."""
    if workers > 1:
        from robo_vln_tpu.data.parallel_loader import parallel_batch_iterator

        it = parallel_batch_iterator(
            path, batch_size, [t], INSTR_LEN, num_workers=workers,
            is_bert=True,
        )
    else:
        ds = TrajectoryDataset(path, batch_size=batch_size, is_bert=True)
        it = batch_iterator(
            ds, batch_size, buckets=[t], max_instruction_len=INSTR_LEN
        )
    frames = 0
    for _ in range(warm_batches):  # absorb open/seek + worker-spawn costs
        next(it)
    t0 = time.perf_counter()
    n_batches = 0
    for batch in it:
        frames += int(batch["valid_mask"].sum())
        n_batches += 1
    dt = time.perf_counter() - t0
    return frames / dt if n_batches else 0.0, frames, dt


def bytes_per_frame():
    new = RGB_HW * RGB_HW * 3 * 1 + DEPTH_HW * DEPTH_HW * 1 * 2
    ref = (RGB_HW * RGB_HW * 3 + DEPTH_HW * DEPTH_HW) * 4
    return new, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--t", type=int, default=100)
    ap.add_argument("--legacy-episodes", type=int, default=2)
    ap.add_argument("--workers", type=int, default=0,
                    help=">1: also measure the process-parallel loader "
                         "(data/parallel_loader.py) at that worker count")
    ap.add_argument("--device-fps", type=float, default=2183.6,
                    help="IL train-step device rate to compare (BENCH_r02)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="input_pipe_bench_")
    try:
        out = {}
        build_buffer(f"{tmp}/buf", args.episodes, args.t)
        for bs in (4, 8):
            if bs > args.episodes:
                continue
            fps, frames, dt = measure_loader_fps(
                f"{tmp}/buf", bs, args.t, args.episodes,
                warm_batches=1 if args.episodes > bs else 0,
            )
            out[f"loader_fps_b{bs}"] = round(fps, 1)
            print(json.dumps({
                "metric": f"loader decode+collate B={bs} T={args.t}",
                "value": round(fps, 1), "unit": "frames/s",
                "frames": frames, "seconds": round(dt, 2),
            }))

        # feature-store buffers (the fastest training mode consumes these;
        # ~205 KB/frame f16 vs ~157 KB raw — measure whether the 1-core host
        # can feed the 13.5k f/s B=16 device rate)
        build_buffer(f"{tmp}/feat", args.episodes, args.t, seed=2,
                     features=True)
        for bs in (8, 16):
            if bs > args.episodes:
                continue
            ffps, fframes, fdt = measure_loader_fps(
                f"{tmp}/feat", bs, args.t, args.episodes,
                warm_batches=1 if args.episodes > bs else 0,
            )
            out[f"feature_loader_fps_b{bs}"] = round(ffps, 1)
            print(json.dumps({
                "metric": f"feature-store loader decode+collate B={bs} "
                          f"T={args.t}",
                "value": round(ffps, 1), "unit": "frames/s",
                "frames": fframes, "seconds": round(fdt, 2),
            }))

        if args.workers > 1:
            for which, bs in (("buf", 8), ("feat", 16)):
                pfps, pframes, pdt = measure_loader_fps(
                    f"{tmp}/{which}", bs, args.t, args.episodes,
                    warm_batches=1, workers=args.workers,
                )
                out[f"parallel_{which}_fps_b{bs}"] = round(pfps, 1)
                print(json.dumps({
                    "metric": f"parallel({args.workers}w) "
                              f"{'feature-store ' if which == 'feat' else ''}"
                              f"loader B={bs} T={args.t}",
                    "value": round(pfps, 1), "unit": "frames/s",
                    "frames": pframes, "seconds": round(pdt, 2),
                }))

        build_buffer(f"{tmp}/legacy", args.legacy_episodes, args.t,
                     legacy_f64=True, seed=1)
        lfps, lframes, ldt = measure_loader_fps(
            f"{tmp}/legacy", min(2, args.legacy_episodes), args.t,
            args.legacy_episodes, warm_batches=0,
        )
        print(json.dumps({
            "metric": f"legacy float64-buffer loader B=2 T={args.t}",
            "value": round(lfps, 1), "unit": "frames/s",
        }))

        if not out:
            raise SystemExit(
                f"--episodes {args.episodes} is below the smallest measured "
                "batch size (4); pass --episodes 4 or more"
            )
        new_b, ref_b = bytes_per_frame()
        best = max(v for k, v in out.items() if k.startswith("loader_fps"))
        print(json.dumps({
            "metric": "input pipeline summary",
            "loader_fps": best,
            "device_train_fps": args.device_fps,
            "loader_vs_device": round(best / args.device_fps, 3),
            "legacy_loader_fps": round(lfps, 1),
            "speedup_vs_legacy": round(best / max(lfps, 1e-9), 2),
            "transfer_bytes_per_frame": new_b,
            "reference_bytes_per_frame": ref_b,
            "bytes_reduction": round(ref_b / new_b, 2),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
