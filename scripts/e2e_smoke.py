"""End-to-end hardware smoke: kinematic expert collection -> trajectory
buffer -> full-size hierarchical training (1 epoch, batch 1 like the paper
config) -> orbax checkpoint -> closed-loop eval of the trained checkpoint.

Validated on the real TPU chip (round 1, 2026-08-16):
  collection: 4 episodes (host-side kinematic C++ sim)
  training:   176.8M-param HCM pair, 7 TBPTT windows, HL loss 1.390 -> 1.344,
              570 s incl. the one-off train-step compile
  eval:       success 1.0, spl 1.0, ndtw 0.648 on the toy episode set

Usage (from the repo root):  python scripts/e2e_smoke.py [out_dir]
E2E_FEATURE_MODE=1 runs the same pipeline through the feature store
(DAGGER.PRELOAD_TRUNK_FEATURES: trunk + frozen-BERT rows precomputed on
the chip by training/featurize.py, training from features, closed-loop
eval still the full forward).
"""
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/robo_vln_e2e"
os.makedirs(OUT, exist_ok=True)


def make_dataset():
    eps = []
    rng = np.random.default_rng(0)
    for i in range(4):
        pts = np.cumsum(
            rng.uniform(-1.5, 1.5, (4, 3)) * np.array([1, 0, 1]), axis=0
        )
        pts[:, 1] = 0
        path = [[0.0, 0.0, 0.0]] + [list(map(float, p)) for p in pts]
        eps.append({
            "episode_id": str(i), "scene_id": f"scene_{i % 2}.glb",
            "start_position": path[0], "start_rotation": [0, 0, 0, 1],
            "goals": [{"position": path[-1], "radius": 3.0}],
            "reference_path": path,
            "instruction": {
                "instruction_text": f"walk to goal {i}",
                "instruction_tokens": list(map(int, rng.integers(1, 2000, 12))),
            },
            "info": {"geodesic_distance": 5.0},
        })
    with gzip.open(f"{OUT}/train.json.gz", "wt") as f:
        json.dump(
            {"episodes": eps, "instruction_vocab": {"word_list": ["<pad>"]}}, f
        )


def main():
    make_dataset()
    from robo_vln_tpu.config.default import get_config

    cfg = get_config(
        "robo_vln_tpu/config/configs/hierarchical_cma.yaml"
    ).clone().defrost()
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = f"{OUT}/train.json.gz"
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 150
    cfg.DAGGER.UPDATE_SIZE = 4
    cfg.DAGGER.EPOCHS = 1
    cfg.DAGGER.BATCH_SIZE = 1
    cfg.DAGGER.EPISODE_LEN_BUCKETS = [100, 200]
    cfg.DAGGER.LMDB_FEATURES_DIR = f"{OUT}/buf"
    cfg.DAGGER.LMDB_EVAL_DIR = f"{OUT}/buf"
    cfg.DAGGER.PRELOAD_LMDB_FEATURES = True
    cfg.CHECKPOINT_FOLDER = f"{OUT}/ckpts"
    cfg.TENSORBOARD_DIR = f"{OUT}/tb"
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 1
    cfg.EVAL.VAL_LOG_DIR = f"{OUT}/val"
    cfg.EVAL.USE_CKPT_CONFIG = False
    if os.environ.get("E2E_FEATURE_MODE"):
        cfg.DAGGER.PRELOAD_TRUNK_FEATURES = True
        # production invariant: both modules' frozen trunks come from the
        # same weight files.  The smoke runs without those files (random
        # init), so sync them at setup (models.sync_frozen_trunks).
        cfg.TPU.SYNC_FROZEN_TRUNKS_ON_INIT = True
    cfg.freeze()

    t0 = time.time()
    from robo_vln_tpu.envs.collection import collect_dataset

    n = collect_dataset(cfg, f"{OUT}/buf")
    print(f"[collect] {n} episodes in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer

    trainer = HierarchicalTrainer(cfg)
    trainer.train()
    print(f"[train] 1 epoch in {time.time() - t0:.1f}s", flush=True)

    metrics = [json.loads(l) for l in open(f"{OUT}/tb/metrics.jsonl")]
    hl = [m["value"] for m in metrics
          if m["tag"] == "Train High Level Action Loss"]
    print(f"[losses] high-level first={hl[0]:.4f} last={hl[-1]:.4f}", flush=True)

    t0 = time.time()
    from robo_vln_tpu.eval.evaluator import eval_hierarchical_checkpoint
    from robo_vln_tpu.training import checkpoint as ckpt_lib
    from robo_vln_tpu.utils.logging import MetricsWriter

    ckpts = ckpt_lib.list_checkpoints(cfg.CHECKPOINT_FOLDER)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as w:
        stats = eval_hierarchical_checkpoint(trainer, ckpts[-1], w, 0)
    scalars = {k: v for k, v in stats.items() if isinstance(v, (int, float))}
    print(f"[eval] {time.time() - t0:.1f}s "
          f"stats={{{', '.join(f'{k}: {v:.3f}' for k, v in scalars.items())}}}"
          f" backbones={stats.get('pretrained_backbones', {})}",
          flush=True)
    print("E2E OK", flush=True)


if __name__ == "__main__":
    main()
