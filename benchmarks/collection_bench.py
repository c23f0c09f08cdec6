#!/usr/bin/env python3
"""Expert-collection throughput: single-env vs process-based workers.

Measures episodes/min of `collect_dataset` on the kinematic C++ backend with
NUM_PROCESSES in {1, N}.  On this 1-core host the parallel win is bounded by
the core count (workers time-slice); the process pool exists for real
habitat collection, where Python-side sim code holds the GIL and threads
cannot scale (reference VectorEnv role, env_utils.py:117-205).

    PYTHONPATH=. python benchmarks/collection_bench.py [--episodes 8] [--procs 2]
"""

import argparse
import gzip
import json
import shutil
import tempfile
import time

from robo_vln_tpu.config.default import get_config


def _episode_json(path, n_eps):
    episodes = []
    for i in range(n_eps):
        p = [[0.0, 0.0, 0.0], [0.0, 0.0, -2.0], [2.0, 0.0, -4.0 - (i % 3)]]
        episodes.append({
            "episode_id": str(i),
            "scene_id": f"scene_{i % 2}.glb",
            "start_position": p[0],
            "start_rotation": [0, 0, 0, 1],
            "goals": [{"position": p[-1], "radius": 3.0}],
            "reference_path": p,
            "instruction": {
                "instruction_text": f"walk forward then turn {i}",
                "instruction_tokens": [1, 2, 3, 4 + (i % 5)],
            },
            "info": {"geodesic_distance": 5.0},
        })
    with gzip.open(path, "wt") as f:
        json.dump({"episodes": episodes,
                   "instruction_vocab": {"word_list": ["<pad>", "walk"]}}, f)


def measure(tmp, data_path, n_eps, procs, hw):
    from robo_vln_tpu.envs.collection import collect_dataset

    cfg = get_config().clone().defrost()
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = hw
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = hw
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = hw
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = hw
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = False
    cfg.DAGGER.UPDATE_SIZE = n_eps
    cfg.NUM_PROCESSES = procs
    cfg.freeze()
    out = f"{tmp}/buf_p{procs}"
    t0 = time.perf_counter()
    n = collect_dataset(cfg, out)
    dt = time.perf_counter() - t0
    return n / dt * 60.0, n, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--hw", type=int, default=224)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="collect_bench_")
    try:
        data = f"{tmp}/train.json.gz"
        _episode_json(data, max(args.episodes, 4))
        for procs in (1, args.procs):
            epm, n, dt = measure(tmp, data, args.episodes, procs, args.hw)
            print(json.dumps({
                "metric": f"expert collection NUM_PROCESSES={procs}",
                "value": round(epm, 2), "unit": "episodes/min",
                "episodes": n, "seconds": round(dt, 2),
            }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
