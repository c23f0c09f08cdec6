"""TopDownMap measure + map-in-frame viz + VIDEO_OPTION "tensorboard" branch
(VERDICT.md missing#5; reference habitat_extensions/config/default.py:97-117
and utils.py:10-71)."""

import json
import os

import numpy as np

from tests.test_envs import make_episode_json
from tests.test_trainers import tiny_config


def _map_env(tmp_path, rng, extra_measures=("TOP_DOWN_MAP",)):
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    data_path = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 18
    cfg.TASK_CONFIG.TASK.MEASUREMENTS = list(
        cfg.TASK_CONFIG.TASK.MEASUREMENTS
    ) + list(extra_measures)
    cfg.TASK_CONFIG.TASK.TOP_DOWN_MAP.MAP_RESOLUTION = 120
    return cfg


def test_top_down_map_measure(tmp_path, rng):
    cfg = _map_env(tmp_path, rng)
    cfg.freeze()
    from robo_vln_tpu.envs.env_utils import construct_env
    from robo_vln_tpu.envs.velocity_control import VelocityControl

    env = construct_env(cfg)
    env.reset()
    info0 = env.habitat_env.get_metrics()
    assert "top_down_map" in info0
    base = np.array(info0["top_down_map"]["map"], copy=True)
    assert base.ndim == 3 and base.shape[2] == 3
    # shortest path drawn in green on reset
    assert (base == np.array([0, 200, 0])).all(axis=-1).any()

    vc = VelocityControl()
    vc.linear_velocity = np.array([0.0, 0.0, -0.8])
    vc.angular_velocity = np.array([0.0, 0.0, 0.0])
    for _ in range(10):
        _, _, _, info = env.step(vc)
    td = info["top_down_map"]
    # agent track drawn in blue as the agent moves
    assert (np.array(td["map"]) == np.array([30, 60, 220])).all(axis=-1).any()
    r, c = td["agent_map_coord"]
    h, w = np.array(td["map"]).shape[:2]
    assert 0 <= r < h and 0 <= c < w
    env.close()


def test_observations_to_image_tiles_map(tmp_path, rng):
    from robo_vln_tpu.tasks.viz import observations_to_image

    obs = {
        "rgb": rng.integers(0, 255, (48, 48, 3)).astype(np.uint8),
        "depth": rng.random((48, 48, 1)).astype(np.float32),
    }
    plain = observations_to_image(obs, {})
    info = {
        "top_down_map": {
            "map": np.full((60, 80, 3), 255, np.uint8),
            "agent_map_coord": (10, 12),
            "agent_angle": 0.5,
        }
    }
    with_map = observations_to_image(obs, info)
    assert with_map.shape[0] == plain.shape[0]
    assert with_map.shape[1] > plain.shape[1]  # map tile appended


def test_eval_video_with_map_and_tensorboard(tmp_path, rng):
    cfg = _map_env(tmp_path, rng)
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 1
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.VIDEO_OPTION = ["disk", "tensorboard"]
    cfg.VIDEO_DIR = str(tmp_path / "videos")
    cfg.freeze()

    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter
    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        stats = eval_flat_checkpoint(trainer, "", writer, 0)
    assert "top_down_map" not in stats  # frame payload, not a scalar

    vids = os.listdir(cfg.VIDEO_DIR)
    assert any(v.endswith(".mp4") for v in vids)

    entries = [
        json.loads(l)
        for l in open(os.path.join(cfg.TENSORBOARD_DIR, "metrics.jsonl"))
    ]
    assert any("video_frames" in e for e in entries)  # tensorboard branch
