"""Closed-loop eval pipeline on the kinematic env with tiny policies: the
full alternation of jitted single-step policy and host sim, episode
termination, nDTW/stats aggregation, and checkpoint loading."""

import json
import os

import numpy as np
import pytest

from tests.test_envs import kinematic_config, make_episode_json
from tests.test_trainers import tiny_config


def test_flat_eval_checkpoint(tmp_path, rng):
    cfg = tiny_config(tmp_path, batch_size=2)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    # point the eval at the kinematic env + synthetic episodes
    data_path = make_episode_json(tmp_path, n_eps=3)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 25
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 1
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint

        stats = eval_flat_checkpoint(trainer, "", writer, checkpoint_index=0)

    assert "ndtw" in stats and 0 <= stats["ndtw"] <= 1
    assert "success" in stats
    assert "spl" in stats
    out = os.path.join(cfg.EVAL.VAL_LOG_DIR, "stats_ckpt_0_train.json")
    assert os.path.exists(out)
    saved = json.load(open(out))
    assert saved["ndtw"] == pytest.approx(stats["ndtw"])


def test_hierarchical_eval_checkpoint(tmp_path, rng):
    cfg = tiny_config(
        tmp_path, trainer="hierarchical_trainer", batch_size=2, hw=32
    )
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    data_path = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 12
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 1
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.PLOT_ATTENTION = True  # per-episode attention heatmap PNGs
    cfg.VIDEO_DIR = str(tmp_path / "videos")
    cfg.freeze()

    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = HierarchicalTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        from robo_vln_tpu.eval.evaluator import eval_hierarchical_checkpoint

        stats = eval_hierarchical_checkpoint(trainer, "", writer, 0)
    assert "ndtw" in stats
    assert "actual_success" in stats
    att_dir = os.path.join(cfg.VIDEO_DIR, "attention")
    assert os.path.isdir(att_dir) and any(
        f.endswith(".png") for f in os.listdir(att_dir)
    ), "PLOT_ATTENTION must write per-episode heatmaps"


def test_use_ckpt_config_full_restore(tmp_path):
    """EVAL.USE_CKPT_CONFIG restores the WHOLE training config (reference
    robo_vln_trainer.py:1008-1011) — task/dagger-side settings come from the
    checkpoint, while the eval-invocation settings (EVAL stanza, split
    overrides) stay from the live config."""
    from types import SimpleNamespace

    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.eval.evaluator import _eval_config

    train_cfg = get_config().clone().defrost()
    train_cfg.DAGGER.MAX_INSTRUCTION_LEN = 77  # non-default training settings
    train_cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = 99
    ckpt = tmp_path / "ckpt.0"
    ckpt.mkdir()
    with open(ckpt / "framework_metadata.json", "w") as f:
        json.dump({"config": train_cfg.to_dict()}, f, default=str)

    eval_cfg = get_config().clone().defrost()
    eval_cfg.EVAL.SPLIT = "val_unseen"
    eval_cfg.EVAL.EPISODE_COUNT = 5
    eval_cfg.freeze()
    cfg = _eval_config(SimpleNamespace(config=eval_cfg), str(ckpt))
    assert cfg.DAGGER.MAX_INSTRUCTION_LEN == 77  # restored from checkpoint
    assert cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH == 99
    assert cfg.EVAL.SPLIT == "val_unseen"  # eval side reapplied
    assert cfg.EVAL.EPISODE_COUNT == 5
    assert cfg.TASK_CONFIG.DATASET.SPLIT == "val_unseen"

    # USE_CKPT_CONFIG=False keeps the eval config untouched
    off = eval_cfg.clone().defrost()
    off.EVAL.USE_CKPT_CONFIG = False
    off.freeze()
    cfg2 = _eval_config(SimpleNamespace(config=off), str(ckpt))
    assert cfg2.DAGGER.MAX_INSTRUCTION_LEN != 77


def test_cyclic_lr_matches_torch():
    import torch

    from robo_vln_tpu.training.optimizers import cyclic_triangular_lr

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=2e-6, max_lr=1e-4, step_size_up=1000,
        step_size_down=30000, cycle_momentum=False,
    )
    for step in [0, 1, 500, 1000, 1001, 15000, 30999]:
        while sched.last_epoch < step:
            sched.step()
        ours = cyclic_triangular_lr(step)
        ref = sched.get_last_lr()[0]
        np.testing.assert_allclose(ours, ref, rtol=1e-6), step


def test_eval_writes_videos(tmp_path, rng):
    cfg = tiny_config(tmp_path, batch_size=2)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    data_path = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 10
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 1
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.VIDEO_OPTION = ["disk"]
    cfg.VIDEO_DIR = str(tmp_path / "videos")
    cfg.freeze()

    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter
    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        eval_flat_checkpoint(trainer, "", writer, 0)
    import glob

    vids = glob.glob(str(tmp_path / "videos" / "*.mp4"))
    assert vids, "expected an .mp4 written by generate_video"


def test_batched_eval_num_envs(tmp_path, rng):
    """EVAL.NUM_ENVS>1: one policy program over the env batch per tick;
    per-env resets via the mask-zero hidden reset; same stats contract."""
    from tests.test_envs import make_episode_json

    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    data_path = make_episode_json(tmp_path, n_eps=4)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 15
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 3
    cfg.EVAL.NUM_ENVS = 2
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter
    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        stats = eval_flat_checkpoint(trainer, "", writer, 0)
    assert "ndtw" in stats and 0 <= stats["ndtw"] <= 1
    assert "actual_success" in stats
    out = os.path.join(cfg.EVAL.VAL_LOG_DIR, "stats_ckpt_0_train.json")
    assert os.path.exists(out)


def test_batched_eval_hierarchical(tmp_path, rng):
    """EVAL.NUM_ENVS>1 on the HCM pair: batched policy program per tick with
    the per-episode BERT-embedding cache (recomputed whenever the stacked
    instruction batch changes on an env reset)."""
    from tests.test_envs import make_episode_json

    cfg = tiny_config(
        tmp_path, trainer="hierarchical_trainer", batch_size=1, hw=32
    )
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=4)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 12
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 3
    cfg.EVAL.NUM_ENVS = 2
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.eval.evaluator import eval_hierarchical_checkpoint
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = HierarchicalTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        stats = eval_hierarchical_checkpoint(trainer, "", writer, 0)
    assert "ndtw" in stats and 0 <= stats["ndtw"] <= 1
    assert "actual_success" in stats


def test_eval_episode_count_exceeding_dataset_terminates(tmp_path, rng):
    """EVAL.EPISODE_COUNT beyond the dataset must evaluate each episode once
    and terminate (the id-keyed stats dict would otherwise spin forever)."""
    from tests.test_envs import make_episode_json

    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 8
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 50  # dataset has 2
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter
    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        stats = eval_flat_checkpoint(trainer, "", writer, 0)
    assert "ndtw" in stats  # terminated with 2 unique episodes


def test_eval_program_cache_reuses_compiles(tmp_path, rng):
    """Evaluating N checkpoints must NOT build N jitted policy programs:
    weights are jit arguments, so one compiled program serves the sweep
    (through the tunneled remote-compile service each extra model-sized
    compile costs minutes, docs/TPU_ENV_NOTES.md)."""
    cfg = tiny_config(tmp_path, batch_size=2)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=3)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 8
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 1
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint
    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        eval_flat_checkpoint(trainer, "", writer, 0)
        programs_after_first = dict(trainer._eval_programs)
        assert len(programs_after_first) == 1
        step_fn = next(iter(programs_after_first.values()))
        eval_flat_checkpoint(trainer, "", writer, 1)
    # same cache entry, same jitted object, exactly one trace signature
    assert trainer._eval_programs == programs_after_first
    assert step_fn._cache_size() == 1

    # changing the captured non-param collections (BN stats restored from a
    # checkpoint sidecar) must invalidate the cached program (SimpleCNN
    # policies have empty extras, so plant one — flax ignores collections the
    # model doesn't use)
    trainer.extra_variables = {
        **trainer.extra_variables,
        "batch_stats": {"planted": np.ones(3, np.float32)},
    }
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        eval_flat_checkpoint(trainer, "", writer, 2)
    assert len(trainer._eval_programs) == 2


def test_ondevice_eval_program_cache(tmp_path, rng):
    """EVAL.ON_DEVICE checkpoint sweeps reuse ONE whole-rollout program per
    (extras, trunk status, config statics) — and repeated evals of the same
    weights produce identical stats."""
    cfg = tiny_config(
        tmp_path, trainer="hierarchical_trainer", batch_size=1, hw=32
    )
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 10
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.ON_DEVICE = True
    cfg.EVAL.ON_DEVICE_BATCH = 2
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.eval.evaluator import eval_hierarchical_checkpoint
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = HierarchicalTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        stats1 = eval_hierarchical_checkpoint(trainer, "", writer, 0)
        programs = dict(trainer._eval_programs)
        stats2 = eval_hierarchical_checkpoint(trainer, "", writer, 1)
    assert trainer._eval_programs == programs  # embed + rollout, built once
    rollout = trainer._eval_programs[
        next(k for k in programs if k[0] == "ondevice_rollout")
    ]
    assert rollout._cache_size() == 1
    for k in ("success", "spl", "ndtw"):
        assert stats1[k] == pytest.approx(stats2[k])


def test_tree_fingerprint_content_keyed():
    """Fingerprint must key on VALUES (checkpoint loads replace the dict
    objects), and distinguish value / dtype / structure changes."""
    import jax.numpy as jnp

    from robo_vln_tpu.eval.evaluator import _tree_fingerprint

    a = {"bn": {"mean": np.arange(8, dtype=np.float32)}}
    b = {"bn": {"mean": np.arange(8, dtype=np.float32)}}  # equal, new objects
    assert _tree_fingerprint(a) == _tree_fingerprint(b)
    assert _tree_fingerprint(a) == _tree_fingerprint(
        {"bn": {"mean": jnp.arange(8, dtype=jnp.float32)}}
    )
    c = {"bn": {"mean": np.arange(8, dtype=np.float32) + 1}}
    assert _tree_fingerprint(a) != _tree_fingerprint(c)
    d = {"bn": {"mean": np.arange(8, dtype=np.float64)}}
    assert _tree_fingerprint(a) != _tree_fingerprint(d)
    e = {"bn2": {"mean": np.arange(8, dtype=np.float32)}}
    assert _tree_fingerprint(a) != _tree_fingerprint(e)


def test_shuffle_instructions_is_a_derangement(tmp_path):
    """Every episode must end up with a DIFFERENT episode's instruction while
    everything else (path, goals, start pose) stays its own."""
    from robo_vln_tpu.data.dataset import VLNCEDatasetV1
    from robo_vln_tpu.eval.evaluator import shuffle_instructions

    ds = VLNCEDatasetV1(data_path=make_episode_json(tmp_path, n_eps=5))
    before = {
        ep.episode_id: (
            ep.instruction.instruction_text,
            list(ep.reference_path),
            list(ep.start_position),
        )
        for ep in ds.episodes
    }
    changed = shuffle_instructions(ds.episodes)
    assert changed == 5
    seen_texts = set()
    for ep in ds.episodes:
        text0, path0, start0 = before[ep.episode_id]
        assert ep.instruction.instruction_text != text0  # wrong instruction
        assert list(ep.reference_path) == path0  # own path/metrics
        assert list(ep.start_position) == start0
        seen_texts.add(ep.instruction.instruction_text)
    # a permutation, not duplication
    assert seen_texts == {t for t, _, _ in before.values()}
    # deterministic: same rotation on a fresh load
    ds2 = VLNCEDatasetV1(data_path=make_episode_json(tmp_path, n_eps=5))
    shuffle_instructions(ds2.episodes)
    assert [e.instruction.instruction_text for e in ds2.episodes] == [
        e.instruction.instruction_text for e in ds.episodes
    ]


def test_flat_eval_shuffled_instruction_control(tmp_path, rng):
    """EVAL.SHUFFLE_INSTRUCTIONS drives the host rollout end to end: the env
    dataset's instructions are rotated before the rollout and the stats json
    still aggregates the episodes' OWN metrics."""
    cfg = tiny_config(tmp_path, batch_size=2)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    data_path = make_episode_json(tmp_path, n_eps=3)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 10
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.SHUFFLE_INSTRUCTIONS = True
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()

    from robo_vln_tpu.eval import evaluator
    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    shuffled_counts = []
    orig = evaluator.shuffle_instructions

    def spy(episodes, label="eval"):
        n = orig(episodes, label)
        shuffled_counts.append(n)
        return n

    evaluator.shuffle_instructions, saved = spy, orig
    try:
        trainer = RoboVLNTrainer(cfg)
        with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
            stats = evaluator.eval_flat_checkpoint(trainer, "", writer, 0)
    finally:
        evaluator.shuffle_instructions = saved
    assert shuffled_counts and shuffled_counts[0] == 3
    assert "ndtw" in stats and "spl" in stats
    out = os.path.join(cfg.EVAL.VAL_LOG_DIR, "stats_ckpt_0_train.json")
    assert os.path.exists(out)


def _daemon_cfg(tmp_path, ckpt_dir, once: bool):
    from robo_vln_tpu.config.default import get_config

    cfg = get_config().clone().defrost()
    cfg.EVAL_CKPT_PATH_DIR = str(ckpt_dir)
    cfg.EVAL.ONCE = once
    cfg.EVAL.POLL_INTERVAL_SEC = 0.05
    cfg.EVAL.POLL_IDLE_TIMEOUT_SEC = 1.0
    cfg.TENSORBOARD_DIR = str(tmp_path / "tb")
    cfg.freeze()
    return cfg


def test_eval_daemon_picks_up_checkpoint_landing_mid_eval(tmp_path):
    """EVAL.ONCE=False: the folder sweep keeps polling (reference
    BaseRLTrainer.eval daemon, README.md:209) — a checkpoint saved while the
    first one is being evaluated is picked up, and POLL_IDLE_TIMEOUT_SEC
    terminates the daemon once no new checkpoints appear."""
    import time as _time

    from robo_vln_tpu.training.trainer import BaseTrainer

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    (ckpt_dir / "ckpt.0").mkdir()
    cfg = _daemon_cfg(tmp_path, ckpt_dir, once=False)
    seen = []

    class _T(BaseTrainer):
        def __init__(self):
            self.config = cfg

        def _eval_checkpoint(self, ck, writer, checkpoint_index=0):
            seen.append((os.path.basename(ck), checkpoint_index))
            if len(seen) == 1:  # training "saves" the next epoch mid-eval
                (ckpt_dir / "ckpt.1").mkdir()

    t0 = _time.time()
    _T().eval()
    assert seen == [("ckpt.0", 0), ("ckpt.1", 1)]
    assert _time.time() - t0 >= 1.0  # exited via the idle timeout


def test_eval_once_ignores_late_checkpoints(tmp_path):
    """EVAL.ONCE=True (default): list the folder once, evaluate, exit —
    checkpoints landing mid-sweep are NOT picked up."""
    from robo_vln_tpu.training.trainer import BaseTrainer

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    (ckpt_dir / "ckpt.0").mkdir()
    cfg = _daemon_cfg(tmp_path, ckpt_dir, once=True)
    seen = []

    class _T(BaseTrainer):
        def __init__(self):
            self.config = cfg

        def _eval_checkpoint(self, ck, writer, checkpoint_index=0):
            seen.append(os.path.basename(ck))
            (ckpt_dir / f"ckpt.{len(seen)}").mkdir()

    _T().eval()
    assert seen == ["ckpt.0"]


def test_eval_daemon_retries_failed_checkpoint(tmp_path):
    """A checkpoint listed mid-save can fail to load; the daemon must retry
    it on the next poll instead of crashing or skipping it."""
    from robo_vln_tpu.training.trainer import BaseTrainer

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    (ckpt_dir / "ckpt.0").mkdir()
    cfg = _daemon_cfg(tmp_path, ckpt_dir, once=False)
    calls = []

    class _T(BaseTrainer):
        def __init__(self):
            self.config = cfg

        def _eval_checkpoint(self, ck, writer, checkpoint_index=0):
            calls.append(os.path.basename(ck))
            if len(calls) == 1:
                raise RuntimeError("checkpoint still being written")

    _T().eval()
    assert calls == ["ckpt.0", "ckpt.0"]  # failed once, retried, succeeded
