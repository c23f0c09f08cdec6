"""On-device closed-loop eval (EVAL.ON_DEVICE, eval/ondevice.py): math-level
parity of every ported sim piece against the host implementations, plus an
end-to-end stats comparison against the host rollout driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robo_vln_tpu.envs.velocity_control import (
    RigidState,
    VelocityControl,
    heading_from_quaternion as host_heading,
    integrate_rigid_state as host_integrate,
)
from robo_vln_tpu.eval import ondevice


def test_integrate_matches_host(rng):
    for _ in range(5):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        p = rng.standard_normal(3)
        lin = rng.standard_normal(3)
        ang = rng.standard_normal(3)
        host = host_integrate(
            RigidState(q.copy(), p.copy()),
            VelocityControl(lin.copy(), ang.copy()), 1 / 30,
        )
        dq, dp = ondevice.integrate_rigid_state(
            jnp.asarray(q, jnp.float32)[None], jnp.asarray(p, jnp.float32)[None],
            jnp.asarray(lin, jnp.float32)[None], jnp.asarray(ang, jnp.float32)[None],
            1 / 30,
        )
        np.testing.assert_allclose(np.asarray(dq)[0], host.rotation, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dp)[0], host.position, atol=1e-6)
        # heading too
        np.testing.assert_allclose(
            float(ondevice.heading_from_quaternion(jnp.asarray(q, jnp.float32)[None])[0]),
            host_heading(q), atol=1e-6,
        )


def test_polyline_distance_matches_host(rng):
    from robo_vln_tpu.envs.env import _PolylineGeodesics

    pts = np.array([[0, 0, 0], [0, 0, -3], [2, 0, -5], [2, 0, -8]], np.float64)
    host = _PolylineGeodesics(pts)
    # pad like pack_episodes (repeat the goal)
    K = 7
    padded = np.concatenate([pts, np.repeat(pts[-1:], K - len(pts), 0)])[None]
    seg = np.linalg.norm(padded[:, 1:] - padded[:, :-1], axis=-1)
    cum = np.concatenate([np.zeros((1, 1)), np.cumsum(seg, axis=1)], axis=1)
    goal = jnp.asarray(padded[:, -1], jnp.float32)
    for _ in range(8):
        p = rng.uniform(-3, 3, 3)
        want = host.distance(p, pts[-1])
        got = float(ondevice.polyline_distance(
            jnp.asarray(padded, jnp.float32), jnp.asarray(cum, jnp.float32),
            jnp.asarray(p, jnp.float32)[None], goal,
        )[0])
        assert got == pytest.approx(want, abs=1e-4)


def test_render_matches_host(rng):
    from robo_vln_tpu.envs.env import KinematicEnv
    from robo_vln_tpu.envs.velocity_control import RigidState

    # drive the host _render at a few poses through a bare env-like object
    class _Shell(KinematicEnv):
        def __init__(self):  # bypass dataset loading
            self._rgb_hw = (32, 32)
            self._depth_hw = (32, 32)
            self._state = RigidState()

    shell = _Shell()
    for _ in range(3):
        pos = rng.standard_normal(3)
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        shell._state = RigidState(rotation=q, position=pos)
        host = shell._render()
        rgb, depth = ondevice.render_obs(
            jnp.asarray(pos, jnp.float32)[None],
            jnp.asarray([host_heading(q)], jnp.float32),
            (32, 32), (32, 32),
        )
        # uint8 normalization can differ by 1 count on rounding boundaries
        assert np.abs(
            np.asarray(rgb[0], np.int16) - host["rgb"].astype(np.int16)
        ).max() <= 1
        np.testing.assert_allclose(
            np.asarray(depth[0], np.float32), host["depth"], atol=2e-3
        )


def test_ondevice_eval_end_to_end_matches_host(tmp_path, rng):
    """EVAL.ON_DEVICE produces the same stats-json contract as the host
    driver, with closely matching metrics on short episodes (float32 device
    sim vs float64 host sim — documented fast path, loose tolerances)."""
    from tests.test_envs import make_episode_json
    from tests.test_trainers import tiny_config

    cfg = tiny_config(tmp_path, trainer="hierarchical_trainer", batch_size=1,
                      hw=32)
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 10
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.ON_DEVICE_BATCH = 2
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs_dev")
    cfg.freeze()

    from robo_vln_tpu.eval.evaluator import eval_hierarchical_checkpoint
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = HierarchicalTrainer(cfg)
    dev_cfg = cfg.clone().defrost()
    dev_cfg.EVAL.ON_DEVICE = True
    dev_cfg.freeze()
    trainer.config = dev_cfg
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        dev_stats = eval_hierarchical_checkpoint(trainer, "", writer, 0)

    host_cfg = cfg.clone().defrost()
    host_cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs_host")
    host_cfg.freeze()
    trainer.config = host_cfg
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        host_stats = eval_hierarchical_checkpoint(trainer, "", writer, 0)

    for k in ("ndtw", "success", "spl", "steps_taken", "path_length",
              "actual_success", "distance_to_goal"):
        assert k in dev_stats, k
    # identical policy, near-identical sims: coarse metrics agree
    assert dev_stats["success"] == host_stats["success"]
    assert dev_stats["actual_success"] == host_stats["actual_success"]
    assert dev_stats["ndtw"] == pytest.approx(host_stats["ndtw"], abs=0.05)
    assert dev_stats["steps_taken"] == pytest.approx(
        host_stats["steps_taken"], abs=1.0
    )


def test_ondevice_eval_flat_policy(tmp_path, rng):
    """EVAL.ON_DEVICE also serves the flat trainer (generic policy_step)."""
    from tests.test_envs import make_episode_json
    from tests.test_trainers import tiny_config

    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 8
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.ON_DEVICE = True
    cfg.EVAL.ON_DEVICE_BATCH = 2
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint
    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        stats = eval_flat_checkpoint(trainer, "", writer, 0)
    assert "ndtw" in stats and 0 <= stats["ndtw"] <= 1
    assert "actual_success" in stats and "spl" in stats
