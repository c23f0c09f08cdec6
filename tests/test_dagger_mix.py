"""DAgger policy-mixed collection (DAGGER.P < 1, envs/dagger.py).

The reference exposes DAGGER.P (config/default.py:63) but its
_update_dataset never mixes actions (robo_vln_trainer.py:387-503); our
P < 1 path implements the VLN-CE semantics as a documented deviation
(docs/PARITY.md): executed action = expert w.p. beta else policy, label =
always the expert's clean action.
"""

import os

import numpy as np
import pytest

from tests.test_trainers import tiny_config


def _langnav_cfg(tmp_path, trainer="robo_vln_trainer", max_steps=40):
    from robo_vln_tpu.data import langnav

    data_dir = str(tmp_path / "data")
    langnav.generate_splits(
        data_dir, n_train=2, n_val_unseen=1, n_val_seen=1, seed=5,
        n_segments=(2,), lengths=(1, 2), scenes=1,
    )
    cfg = tiny_config(tmp_path, trainer=trainer, batch_size=1, hw=40)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = False
    cfg.MODEL.INSTRUCTION_ENCODER.vocab_size = 140  # langnav ids start at 100
    cfg.DAGGER.MAX_INSTRUCTION_LEN = 20
    tc = cfg.TASK_CONFIG
    tc.SIMULATOR.TYPE = "kinematic"
    tc.DATASET.DATA_PATH = os.path.join(data_dir, "{split}", "{split}.json.gz")
    tc.DATASET.SPLIT = "train"
    tc.ENVIRONMENT.MAX_EPISODE_STEPS = max_steps
    tc.SIMULATOR.RGB_SENSOR.WIDTH = tc.SIMULATOR.RGB_SENSOR.HEIGHT = 40
    tc.SIMULATOR.DEPTH_SENSOR.WIDTH = tc.SIMULATOR.DEPTH_SENSOR.HEIGHT = 40
    return cfg


def _read_buffer(path):
    from robo_vln_tpu.data import serialization
    from robo_vln_tpu.data.trajectory_store import TrajectoryStore

    out = []
    with TrajectoryStore(path) as store:
        for i in range(len(store)):
            obs, prev, corr, stop = serialization.unpackb_any(store.get(i))
            out.append((
                {k: np.asarray(v) for k, v in obs.items()},
                np.asarray(prev, np.float64).reshape(-1, 2),
                np.asarray(corr, np.float64).reshape(-1, 2),
                stop,
            ))
    return out


class _StubMixer:
    """Deterministic 'policy': always commands zero velocity."""

    def __init__(self):
        self.steps = 0
        self.resets = 0

    def reset(self):
        self.resets += 1

    def set_prev(self, v, w):
        pass

    def step(self, observations):
        self.steps += 1
        return 0.0, 0.0


def test_beta1_with_mixer_is_bitwise_pure_expert(tmp_path):
    """beta=1.0: the coin never fires; the buffer must equal the no-mixer
    run bit for bit (the mix rng is an independent stream)."""
    from robo_vln_tpu.envs.collection import collect_dataset

    cfg = _langnav_cfg(tmp_path)
    cfg.freeze()
    a, b = str(tmp_path / "buf_a"), str(tmp_path / "buf_b")
    assert collect_dataset(cfg, a, update_size=2) == 2
    mixer = _StubMixer()
    assert collect_dataset(cfg, b, update_size=2, mixer=mixer, beta=1.0) == 2
    assert mixer.steps > 0 and mixer.resets == 2  # network ticked every step

    for ep_a, ep_b in zip(_read_buffer(a), _read_buffer(b)):
        obs_a, prev_a, corr_a, stop_a = ep_a
        obs_b, prev_b, corr_b, stop_b = ep_b
        np.testing.assert_array_equal(corr_a, corr_b)
        np.testing.assert_array_equal(prev_a, prev_b)
        np.testing.assert_array_equal(obs_a["rgb"], obs_b["rgb"])


def test_beta0_executes_policy_labels_stay_expert(tmp_path):
    """beta=0.0 with a do-nothing stub policy: the agent never moves, so the
    episode runs to MAX_EPISODE_STEPS, the visited states stay at the start
    pose, and the recorded labels are the EXPERT's (nonzero velocity toward
    the first waypoint) — not the executed zeros."""
    from robo_vln_tpu.envs.collection import collect_dataset

    cfg = _langnav_cfg(tmp_path, max_steps=25)
    cfg.freeze()
    buf = str(tmp_path / "buf_mixed")
    assert collect_dataset(
        cfg, buf, update_size=1, mixer=_StubMixer(), beta=0.0
    ) == 1

    obs, prev, corr, stops = _read_buffer(buf)[0]
    assert corr.shape[0] == 25  # never reached the goal -> episode_over cap
    # labels stay the expert's corrective command at the visited (stationary)
    # state: forward = NEGATIVE local z (langnav.py conventions), ramping as
    # v <- (v - 1)/2 toward -1.0 (continuous_path_follower.py:138-140) while
    # the EXECUTED command is 0.0 every step
    assert np.all(corr[2:, 0] < -0.1)
    assert np.allclose(corr[10:, 0], -1.0, atol=0.01)
    # stored label-prev stream mirrors the label stream, not the executed one
    np.testing.assert_allclose(prev[1:], corr[:-1])


def test_real_mixer_rollout_and_divergence(tmp_path):
    """PolicyMixer on the real tiny flat policy: beta=0 rollouts execute the
    (untrained) policy and must visit different states than the expert."""
    from robo_vln_tpu.envs.collection import collect_dataset
    from robo_vln_tpu.envs.dagger import mixer_for_trainer
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    cfg = _langnav_cfg(tmp_path, max_steps=20)
    cfg.freeze()
    trainer = RoboVLNTrainer(cfg)
    trainer._setup_policy()
    mixer = mixer_for_trainer(trainer)

    pure, mixed = str(tmp_path / "pure"), str(tmp_path / "mixed")
    assert collect_dataset(cfg, pure, update_size=1) == 1
    assert collect_dataset(cfg, mixed, update_size=1, mixer=mixer,
                           beta=0.0) == 1

    obs_p = _read_buffer(pure)[0][0]
    obs_m = _read_buffer(mixed)[0][0]
    t = min(obs_p["rgb"].shape[0], obs_m["rgb"].shape[0])
    assert t >= 5
    # the kinematic renderer keys observations on pose: off-policy execution
    # must visit different states than the expert from step ~1 on
    assert not np.array_equal(obs_p["rgb"][2:t], obs_m["rgb"][2:t])


@pytest.mark.parametrize("trainer_name", ["robo_vln_trainer",
                                          "hierarchical_trainer"])
def test_trainer_dagger_iterations_grow_buffer(tmp_path, trainer_name):
    """DAGGER.ITERATIONS=2 + P<1 + PRELOAD=False: iteration 0 collects pure
    expert (beta=P**0=1), iteration 1 mixes with the just-trained policy;
    the buffer aggregates both (classic DAgger)."""
    from robo_vln_tpu.data.trajectory_store import TrajectoryStore

    cfg = _langnav_cfg(tmp_path, trainer=trainer_name, max_steps=20)
    cfg.DAGGER.PRELOAD_LMDB_FEATURES = False
    cfg.DAGGER.ITERATIONS = 2
    cfg.DAGGER.P = 0.5
    cfg.DAGGER.UPDATE_SIZE = 2
    cfg.DAGGER.EPOCHS = 1
    cfg.DAGGER.EPISODE_LEN_BUCKETS = [20]
    cfg.DAGGER.tbptt_steps = 10
    cfg.freeze()

    if trainer_name == "hierarchical_trainer":
        from robo_vln_tpu.training.hierarchical_trainer import (
            HierarchicalTrainer as T,
        )
    else:
        from robo_vln_tpu.training.trainer import RoboVLNTrainer as T

    T(cfg).train()
    with TrajectoryStore(cfg.DAGGER.LMDB_FEATURES_DIR) as store:
        assert len(store) == 4  # 2 episodes x 2 dagger iterations
