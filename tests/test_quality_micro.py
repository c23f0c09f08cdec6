"""Micro-scale closed-loop learning regression (CPU, slow-marked).

Pins the round-4 quality finding end-to-end WITHOUT TPU hardware: a tiny
flat policy trained on micro LangNav episodes with the study configuration
(TPU.VALID_MASK_VELOCITY_MSE + DAGGER.COLLECT_ACTION_NOISE, PARITY.md
deviations) must actually improve CLOSED-LOOP navigation — not just training
loss.  This is the smallest committed form of the convergence-study claim:
expert collection -> buffer -> jitted training -> host-driver rollout, all on
the virtual CPU mesh.  (The reference has no such test; its closed-loop
quality was only ever measured by full eval runs, README.md:236-239.)
"""

import os

import numpy as np
import pytest

from tests.test_trainers import tiny_config


def _micro_config(tmp_path, data_dir):
    cfg = tiny_config(tmp_path, batch_size=1)  # global batch 8 (virtual mesh)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = False
    # langnav word ids start at 100 (langnav.WORD_TO_ID)
    cfg.MODEL.INSTRUCTION_ENCODER.vocab_size = 140
    cfg.DAGGER.MAX_INSTRUCTION_LEN = 20

    tc = cfg.TASK_CONFIG
    tc.SIMULATOR.TYPE = "kinematic"
    tc.DATASET.DATA_PATH = os.path.join(data_dir, "{split}", "{split}.json.gz")
    gt = os.path.join(data_dir, "{split}", "{split}_gt.json.gz")
    tc.TASK.NDTW.GT_PATH = gt
    tc.TASK.SDTW.GT_PATH = gt
    tc.DATASET.SPLIT = "train"
    tc.ENVIRONMENT.MAX_EPISODE_STEPS = 160
    # micro paths are 2-4 m; the task default 3.0 m radius would be trivial
    for node in (tc.TASK, tc.TASK.SUCCESS, tc.TASK.SPL, tc.TASK.NDTW,
                 tc.TASK.SDTW, tc.TASK.ORACLE_SUCCESS, tc.TASK.ORACLE_SPL):
        node.SUCCESS_DISTANCE = 0.75
    tc.TASK.VLN_ORACLE_ACTION_SENSOR.GOAL_RADIUS = 0.75

    d = cfg.DAGGER
    d.EPOCHS = 10
    d.BATCH_SIZE = 1
    d.tbptt_steps = 40
    d.EPISODE_LEN_BUCKETS = [160]
    d.PRELOAD_LMDB_FEATURES = True
    d.LMDB_FEATURES_DIR = str(tmp_path / "buffer")
    d.LMDB_EVAL_DIR = str(tmp_path / "no_val_buffer")
    # the round-4 study deviations under test (docs/PARITY.md)
    d.COLLECT_ACTION_NOISE = 0.15
    cfg.TPU.VALID_MASK_VELOCITY_MSE = True

    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 4
    cfg.EVAL.ON_DEVICE = False  # float64 host driver
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val")
    return cfg


@pytest.mark.slow
def test_micro_closed_loop_learning(tmp_path):
    from robo_vln_tpu.data import langnav
    from robo_vln_tpu.envs.collection import collect_dataset
    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint
    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    data_dir = str(tmp_path / "data")
    langnav.generate_splits(
        data_dir, n_train=4, n_val_unseen=2, n_val_seen=2, seed=3,
        n_segments=(2,), lengths=(1, 2), scenes=1,
    )
    cfg = _micro_config(tmp_path, data_dir)
    cfg.freeze()

    assert collect_dataset(
        cfg, cfg.DAGGER.LMDB_FEATURES_DIR, update_size=4
    ) == 4

    trainer = RoboVLNTrainer(cfg)
    trainer.train()

    ckpts = sorted(
        os.listdir(cfg.CHECKPOINT_FOLDER),
        key=lambda n: int(n.split(".")[1]),
    )
    assert len(ckpts) >= 2

    def rollout(ckpt_name, idx):
        t = RoboVLNTrainer(cfg)
        with MetricsWriter(str(tmp_path / "tb_eval")) as w:
            return eval_flat_checkpoint(
                t, os.path.join(cfg.CHECKPOINT_FOLDER, ckpt_name), w, idx
            )

    first = rollout(ckpts[0], 0)
    final = rollout(ckpts[-1], 1)

    # closed-loop navigation must improve from the first to the final epoch:
    # the trained policy gets materially closer to the goal, and reaches at
    # least one of the four 2-4 m goals within the 0.75 m radius AND stops
    # there (actual_success requires the stop decision, not just proximity)
    assert np.isfinite(final["navigation_error"])
    assert final["navigation_error"] < first["navigation_error"] - 0.25
    assert final["success"] > 0.0
    assert final["actual_success"] > 0.0
    # nDTW is deliberately NOT compared first-vs-final: the reference metric
    # (measures.py:320-333) appends 30 Hz rollout positions but dedups exact
    # repeats, so an untrained near-stationary policy aligns a ~1-point
    # trajectory against the gt and can outscore any real moving rollout at
    # this micro scale/threshold; only same-length-regime nDTW comparisons
    # are meaningful (the full study compares moving policies to the expert
    # upper bound).  Here we only require the metric to be computed and
    # strictly positive on the dense gt.
    assert np.isfinite(final["ndtw"]) and final["ndtw"] > 0.0
    # the untrained policy barely moves; the trained one actually travels
    assert final["path_length"] > first["path_length"] + 1.0
