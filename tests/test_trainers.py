"""End-to-end trainer integration on the virtual 8-device CPU mesh: synthetic
expert buffer -> bucketed batches -> jitted sharded train steps -> decreasing
loss -> orbax checkpoint round-trip."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robo_vln_tpu.config.default import get_config
from robo_vln_tpu.data.loader import write_episode
from robo_vln_tpu.data.trajectory_store import TrajectoryStore


def tiny_config(tmp_path, trainer="robo_vln_trainer", batch_size=1, hw=64):
    """batch_size is PER-DEVICE (global = 8x on the virtual mesh).
    hw: sensor size — SimpleCNN needs >=36px; the resnet paths run at 32."""
    cfg = get_config().clone().defrost()
    cfg.TRAINER_NAME = trainer
    cfg.DAGGER.BATCH_SIZE = batch_size
    cfg.DAGGER.EPOCHS = 1
    cfg.DAGGER.tbptt_steps = 4
    cfg.DAGGER.EPISODE_LEN_BUCKETS = [4, 8]
    cfg.DAGGER.MAX_INSTRUCTION_LEN = 12
    cfg.DAGGER.PRELOAD_LMDB_FEATURES = True
    cfg.DAGGER.LMDB_FEATURES_DIR = str(tmp_path / "train_buf")
    cfg.DAGGER.LMDB_EVAL_DIR = str(tmp_path / "eval_buf")
    cfg.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    cfg.TENSORBOARD_DIR = str(tmp_path / "tb")
    # tiny shapes
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = hw
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = hw
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = hw
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = hw
    mc = cfg.MODEL
    # reduced ResNet stage depths: same code path, ~4x faster CPU compile/run
    mc.DEPTH_ENCODER.blocks = [1, 1, 1, 1]
    mc.RGB_ENCODER.blocks = [1, 1, 1, 1]
    mc.INSTRUCTION_ENCODER.vocab_size = 60
    mc.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    mc.STATE_ENCODER.hidden_size = 32
    mc.INSTRUCTION_ENCODER.hidden_size = 16
    mc.RGB_ENCODER.output_size = 16
    mc.DEPTH_ENCODER.output_size = 8
    mc.BERT.num_layers = 1
    mc.BERT.hidden_size = 16
    mc.BERT.num_heads = 2
    mc.BERT.intermediate_size = 32
    mc.BERT.vocab_size = 60
    mc.VISUAL_LING_ATTN.ins_in_features = 16
    mc.VISUAL_LING_ATTN.d_model = 16
    mc.VISUAL_LING_ATTN.d_ff = 32
    mc.VISUAL_LING_ATTN.h = 2
    return cfg


def fill_buffer(path, rng, n_eps=16, t_range=(5, 8), hw=64, instr_len=10):
    with TrajectoryStore(path, writable=True) as store:
        for k in range(n_eps):
            t = int(rng.integers(*t_range))
            obs = {
                "rgb": rng.integers(0, 255, (t, hw, hw, 3)).astype(np.float32),
                "depth": rng.random((t, hw, hw, 1)).astype(np.float32),
                "progress": np.linspace(0, 1, t).astype(np.float32),
                "vln_oracle_action_sensor": rng.integers(1, 4, (t, 1)).astype(
                    np.float64
                ),
                "instruction": np.tile(
                    rng.integers(1, 50, (1, instr_len)).astype(np.float64), (t, 1)
                ),
                "glove_tokens": np.tile(
                    rng.integers(1, 50, (1, instr_len)).astype(np.float64), (t, 1)
                ),
            }
            prev = rng.standard_normal((t, 2)) * 0.1
            corr = rng.standard_normal((t, 2)) * 0.5 + 0.5
            write_episode(store, k, obs, prev, corr, [t - 1] * t)
        store.flush()


def test_flat_trainer_end_to_end(tmp_path, rng):
    assert len(jax.devices()) == 8, "tests expect the virtual 8-device mesh"
    cfg = tiny_config(tmp_path)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng)
    fill_buffer(cfg.DAGGER.LMDB_EVAL_DIR, rng, n_eps=8)

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    assert trainer.mesh.devices.size == 8
    trainer.train()

    # loss decreased over the epoch
    import json

    metrics = [
        json.loads(l)
        for l in open(os.path.join(cfg.TENSORBOARD_DIR, "metrics.jsonl"))
    ]
    totals = [m["value"] for m in metrics if m["tag"] == "Total Loss"]
    assert len(totals) >= 3
    assert totals[-1] < totals[0]

    # checkpoint round-trip restores exactly
    from robo_vln_tpu.training import checkpoint as ckpt_lib

    ckpts = ckpt_lib.list_checkpoints(cfg.CHECKPOINT_FOLDER)
    assert ckpts
    restored = ckpt_lib.load_checkpoint(ckpts[-1], trainer.state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(trainer.state.params), restored.params,
    )


def test_flat_trainer_params_update_and_frozen(tmp_path, rng):
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.MODEL.PROGRESS_MONITOR.use = True
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=4)
    fill_buffer(cfg.DAGGER.LMDB_EVAL_DIR, rng, n_eps=2)

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    trainer._setup_policy()
    p0 = jax.device_get(trainer.state.params)
    from robo_vln_tpu.utils.logging import MetricsWriter

    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        trainer.train_epoch(
            trainer._batches(cfg.DAGGER.LMDB_FEATURES_DIR, 0), 0, writer, 0
        )
    p1 = jax.device_get(trainer.state.params)
    assert not np.allclose(p1["linear"]["kernel"], p0["linear"]["kernel"])


@pytest.mark.slow  # duplicate of the driver's dryrun_multichip gate + hier eval test
def test_hierarchical_trainer_end_to_end(tmp_path, rng):
    cfg = tiny_config(
        tmp_path, trainer="hierarchical_trainer", batch_size=1, hw=32
    )
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=8, hw=32)
    fill_buffer(cfg.DAGGER.LMDB_EVAL_DIR, rng, n_eps=4, hw=32)

    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer

    trainer = HierarchicalTrainer(cfg)
    trainer.train()

    import json

    metrics = [
        json.loads(l)
        for l in open(os.path.join(cfg.TENSORBOARD_DIR, "metrics.jsonl"))
    ]
    hl = [m["value"] for m in metrics if m["tag"] == "Train High Level Action Loss"]
    ll = [m["value"] for m in metrics if m["tag"] == "Train Low_level Total Loss"]
    assert hl and ll
    assert hl[-1] < hl[0]
    # frozen BERT untouched by AdamW decay (masked out of the optimizer)
    assert np.isfinite(hl).all() and np.isfinite(ll).all()


def test_inflection_weight_flag_wires_coef(tmp_path, rng, monkeypatch):
    """TPU.APPLY_INFLECTION_WEIGHTS=True threads MODEL.inflection_weight_coef
    into the jitted step; default-off keeps the reference's preserved no-op
    (PARITY.md: the reference computes inflec_weights and never uses them)."""
    from robo_vln_tpu.training import steps as steps_lib
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer

    captured = {}
    orig = steps_lib.make_hier_train_step

    def spy(*a, **k):
        captured["coef"] = k.get("inflection_coef")
        return orig(*a, **k)

    monkeypatch.setattr(steps_lib, "make_hier_train_step", spy)

    for flag, want in ((True, 3.2), (False, None)):
        cfg = tiny_config(
            tmp_path / str(flag), trainer="hierarchical_trainer",
            batch_size=1, hw=32,
        )
        cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
        cfg.TPU.APPLY_INFLECTION_WEIGHTS = flag
        cfg.freeze()
        HierarchicalTrainer(cfg)._setup_policy()
        assert captured["coef"] == want


def test_inflection_weighting_changes_hl_loss_only(rng):
    """With a non-uniform inflection pattern the weighted high-level CE must
    differ from the unweighted one, while the low-level losses (not touched
    by IW) stay identical."""
    import __graft_entry__ as g
    from robo_vln_tpu.training import steps as steps_lib

    batch, t = 2, 6
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = (
        g._hcm_setup(rgb_hw=64, depth_hw=64, instr_len=12, batch=batch, t=t,
                     tiny=True)
    )
    h_extra = {k: v for k, v in hparams.items() if k != "params"}
    l_extra = {k: v for k, v in lparams.items() if k != "params"}

    class _B:
        def __init__(self, p, e):
            self._p, self._e = p, e

        def apply(self, variables, *a, **k):
            return self._p.apply({**self._e, **variables}, *a, **k)

    # mixed transitions: some inflections, some repeats (all-inflection
    # windows would make the weights uniform and the weighted mean equal)
    oracle = np.array([[2, 2, 3, 3, 1, 1], [1, 4, 4, 4, 2, 2]], np.float32)
    batch_data = {
        **obs,
        "vln_oracle_action_sensor": jnp.asarray(oracle),
        "prev_actions": prev,
        "corrected_actions": jnp.asarray(
            rng.random((batch, t, 2)), jnp.float32
        ),
        "oracle_stop": jnp.asarray(
            (rng.random((batch, t, 1)) > 0.7).astype(np.float32)
        ),
        "not_done_masks": masks,
        "valid_mask": jnp.ones((batch, t), jnp.float32),
    }
    args = (_B(high, h_extra), _B(low, l_extra), hparams["params"],
            lparams["params"], batch_data, hh, lh)
    plain = steps_lib._hier_losses(*args)
    weighted = steps_lib._hier_losses(*args, inflection_coef=3.2)
    assert abs(float(plain[0]) - float(weighted[0])) > 1e-6
    np.testing.assert_allclose(float(plain[1]), float(weighted[1]), rtol=1e-6)
    np.testing.assert_allclose(float(plain[2]), float(weighted[2]), rtol=1e-6)


def test_trainer_registry():
    import robo_vln_tpu.training.hierarchical_trainer  # noqa: F401
    import robo_vln_tpu.training.trainer  # noqa: F401
    from robo_vln_tpu.utils.registry import get_trainer

    assert get_trainer("robo_vln_trainer").__name__ == "RoboVLNTrainer"
    assert get_trainer("hierarchical_trainer").__name__ == "HierarchicalTrainer"


def test_nan_guard_skips_update(tmp_path, rng):
    """A poisoned (NaN) batch must not change params or optimizer state."""
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.freeze()
    from robo_vln_tpu.parallel import mesh as mesh_lib
    from robo_vln_tpu.training.trainer import RoboVLNTrainer, _dummy_batch

    trainer = RoboVLNTrainer(cfg)
    trainer._setup_policy()
    gb = trainer.global_batch
    p0 = jax.device_get(trainer.state.params)

    batch = _dummy_batch(cfg, gb, t=4)
    batch["corrected_actions"][:] = 1.0
    batch["oracle_stop"][:] = 1.0
    batch["depth"][0, 0, 0, 0, 0] = np.nan  # poison (rgb is uint8 now)
    hidden = trainer.policy.initial_hidden(gb)
    batch = mesh_lib.shard_batch(trainer.mesh, batch)
    state, hidden, metrics = trainer.train_step(
        trainer.state, hidden, batch, cfg.DAGGER.LR
    )
    assert float(metrics["skipped_nonfinite"]) == 1.0
    p1 = jax.device_get(state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p0, p1,
    )

    # a clean batch updates normally
    clean = _dummy_batch(cfg, gb, t=4)
    clean["corrected_actions"][:] = 1.0
    clean["oracle_stop"][:] = 1.0
    clean["rgb"][:] = 10.0
    clean = mesh_lib.shard_batch(trainer.mesh, clean)
    hidden = trainer.policy.initial_hidden(gb)
    state2, _, m2 = trainer.train_step(state, hidden, clean, cfg.DAGGER.LR)
    assert float(m2["skipped_nonfinite"]) == 0.0
    p2 = jax.device_get(state2.params)
    assert not np.allclose(p2["linear"]["kernel"], p1["linear"]["kernel"])


def test_batch_scales_to_all_devices(tmp_path, rng):
    """VERDICT.md weak#1: at BATCH_SIZE=1 per device the global batch must be
    8 on the 8-device mesh and every device must hold a batch shard."""
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.freeze()
    from robo_vln_tpu.parallel import mesh as mesh_lib
    from robo_vln_tpu.training.trainer import RoboVLNTrainer, _dummy_batch

    trainer = RoboVLNTrainer(cfg)
    assert trainer.mesh.devices.size == 8
    assert trainer.global_batch == 8
    batch = mesh_lib.shard_batch(trainer.mesh, _dummy_batch(cfg, 8, t=4))
    shard_devices = {s.device for s in batch["rgb"].addressable_shards}
    assert len(shard_devices) == 8, "every device must hold a shard"
    assert batch["rgb"].addressable_shards[0].data.shape[0] == 1


def test_tail_batch_padding_masks_out(tmp_path, rng):
    """A padded tail batch (fewer episodes than the global batch) must train
    identically to the same episodes alone: padding rows are fully masked."""
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=3)  # < global batch 8

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    batches = list(trainer._batches(cfg.DAGGER.LMDB_FEATURES_DIR, seed=0))
    assert len(batches) == 1
    b = batches[0]
    assert b["rgb"].shape[0] == 8
    # exactly 3 real episodes, 5 fully-masked padding rows
    real = (b["valid_mask"].sum(axis=1) > 0)
    assert int(real.sum()) == 3
    pad = ~real
    assert np.all(b["corrected_actions"][pad] == 0)
    assert np.all(b["oracle_stop"][pad] == -1.0)
    assert np.all(b["vln_oracle_action_sensor"][pad] == 0)


def test_remat_matches_no_remat(tmp_path, rng):
    """TPU.REMAT must change memory behavior only: losses and updated params
    are identical with and without rematerialization."""
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    from robo_vln_tpu.parallel import mesh as mesh_lib
    from robo_vln_tpu.training import steps as steps_lib
    from robo_vln_tpu.training.trainer import RoboVLNTrainer, _dummy_batch

    results = {}
    for remat in (False, True):
        c = cfg.clone()
        c.TPU.REMAT = remat
        c.freeze()
        trainer = RoboVLNTrainer(c)
        trainer._setup_policy()
        gb = trainer.global_batch
        batch = _dummy_batch(c, gb, t=4)
        batch["corrected_actions"][:] = 0.7
        batch["oracle_stop"][:] = 1.0
        batch["rgb"][:] = 3.0
        batch = mesh_lib.shard_batch(trainer.mesh, batch)
        hidden = trainer.policy.initial_hidden(gb)
        state, _, metrics = trainer.train_step(
            trainer.state, hidden, batch, c.DAGGER.LR
        )
        results[remat] = (
            float(metrics["total_loss"]), jax.device_get(state.params)
        )
    assert np.isclose(results[False][0], results[True][0], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        results[False][1], results[True][1],
    )


def test_resume_matches_uninterrupted_run(tmp_path, rng):
    """DAGGER.RESUME + MAX_EPOCHS_PER_RUN: a run split across two trainer
    processes produces bit-identical final parameters to one uninterrupted
    run — data order (epoch-seeded), dropout streams (step-keyed), optimizer
    state (orbax) and TB counters (ckpt metadata) all restore exactly."""
    def base_cfg(subdir):
        cfg = tiny_config(tmp_path, batch_size=1)
        cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
        cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
        cfg.DAGGER.EPOCHS = 2
        cfg.CHECKPOINT_FOLDER = str(tmp_path / subdir / "ckpts")
        cfg.TENSORBOARD_DIR = str(tmp_path / subdir / "tb")
        return cfg

    fill_buffer(str(tmp_path / "train_buf"), np.random.default_rng(7), n_eps=6)
    fill_buffer(str(tmp_path / "eval_buf"), np.random.default_rng(8), n_eps=2)

    from robo_vln_tpu.training import checkpoint as ckpt_lib
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    # A: uninterrupted 2-epoch run
    cfg = base_cfg("runA")
    cfg.freeze()
    RoboVLNTrainer(cfg).train()
    final_a = ckpt_lib.list_checkpoints(cfg.CHECKPOINT_FOLDER)[-1]

    # B: one epoch per "process" (fresh trainer objects), resumed
    cfg1 = base_cfg("runB")
    cfg1.DAGGER.RESUME = True
    cfg1.DAGGER.MAX_EPOCHS_PER_RUN = 1
    cfg1.freeze()
    RoboVLNTrainer(cfg1).train()
    assert len(ckpt_lib.list_checkpoints(cfg1.CHECKPOINT_FOLDER)) == 1
    RoboVLNTrainer(cfg1).train()  # fresh object = fresh process
    ckpts_b = ckpt_lib.list_checkpoints(cfg1.CHECKPOINT_FOLDER)
    assert len(ckpts_b) == 2
    meta = ckpt_lib.load_metadata(ckpts_b[-1])
    assert meta["train_steps"] > ckpt_lib.load_metadata(ckpts_b[0])["train_steps"]

    # identical final states
    trainer = RoboVLNTrainer(cfg)
    trainer._setup_policy()
    sa = ckpt_lib.load_checkpoint(final_a, trainer.state)
    sb = ckpt_lib.load_checkpoint(ckpts_b[-1], trainer.state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        sa.params, sb.params,
    )

    # a third run is a no-op (already complete)
    RoboVLNTrainer(cfg1).train()
    assert len(ckpt_lib.list_checkpoints(cfg1.CHECKPOINT_FOLDER)) == 2


def test_collect_then_train_one_run(tmp_path, rng):
    """PRELOAD=False + COLLECT_ONLY=False: one train() call fills the buffer
    from expert rollouts AND produces checkpoints (VERDICT.md missing#6)."""
    from tests.test_envs import make_episode_json

    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.DAGGER.PRELOAD_LMDB_FEATURES = False
    cfg.DAGGER.COLLECT_ONLY = False
    cfg.DAGGER.ITERATIONS = 1
    cfg.DAGGER.UPDATE_SIZE = 3
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=3)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 12
    cfg.DAGGER.COLLECT_DATA_SPLIT = "train"
    cfg.freeze()

    from robo_vln_tpu.data.trajectory_store import TrajectoryStore
    from robo_vln_tpu.training import checkpoint as ckpt_lib
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    trainer.train()

    with TrajectoryStore(cfg.DAGGER.LMDB_FEATURES_DIR) as store:
        assert len(store) >= 1  # buffer filled by the same call
    assert ckpt_lib.list_checkpoints(cfg.CHECKPOINT_FOLDER)  # and trained


def test_collect_only_flag_stops_after_collection(tmp_path, rng):
    """COLLECT_ONLY=True reproduces the reference's collect-then-stop."""
    from tests.test_envs import make_episode_json

    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.DAGGER.PRELOAD_LMDB_FEATURES = False
    cfg.DAGGER.COLLECT_ONLY = True
    cfg.DAGGER.UPDATE_SIZE = 2
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = make_episode_json(tmp_path, n_eps=2)
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 10
    cfg.DAGGER.COLLECT_DATA_SPLIT = "train"
    cfg.freeze()

    from robo_vln_tpu.data.trajectory_store import TrajectoryStore
    from robo_vln_tpu.training import checkpoint as ckpt_lib
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    trainer.train()
    with TrajectoryStore(cfg.DAGGER.LMDB_FEATURES_DIR) as store:
        assert len(store) >= 1
    assert not ckpt_lib.list_checkpoints(cfg.CHECKPOINT_FOLDER)


def test_param_shardings_tensor_parallel(rng):
    """Megatron-style TP rules: big 2-D kernels shard over "model", small
    leaves replicate, and a model=1 mesh degenerates to full replication."""
    import jax
    import jax.numpy as jnp

    from robo_vln_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh([4, 2], ["data", "model"])
    params = {
        "ffn_up": jnp.zeros((64, 256)),     # column-parallel (out dim)
        "ffn_down": jnp.zeros((256, 64)),   # row-parallel (in dim)
        "small": jnp.zeros((8, 8)),         # below min_size -> replicated
        "bias": jnp.zeros((256,)),          # 1-D -> replicated
        "odd": jnp.zeros((64, 255)),        # out dim not divisible -> replicated
    }
    sh = mesh_lib.param_shardings(params, mesh, min_size=1024)
    assert sh["ffn_up"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["ffn_down"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()

    mesh1 = mesh_lib.make_mesh([8, 1], ["data", "model"])
    sh1 = mesh_lib.param_shardings(params, mesh1, min_size=1024)
    assert all(
        s.spec == jax.sharding.PartitionSpec() for s in jax.tree.leaves(sh1)
    )

    # sharded matmul executes and matches the replicated result
    x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    ws = jax.device_put(w, sh["ffn_up"])
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, "x"))
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), rtol=1e-5)


def test_tail_batch_loss_scale_matches_full_batch(tmp_path, rng):
    """Velocity-MSE on a padded tail batch must match the same episodes in an
    unpadded batch (the B/real_B correction): padding must not down-weight
    the action loss relative to the count-normalized stop/CE losses."""
    import jax.numpy as jnp

    from robo_vln_tpu.training.steps import _flat_losses

    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.freeze()
    from robo_vln_tpu.training.trainer import RoboVLNTrainer, _dummy_batch

    trainer = RoboVLNTrainer(cfg)
    trainer._setup_policy()

    def losses_for(B, real):
        b = _dummy_batch(cfg, B, t=4)
        b["rgb"][:real] = 5.0
        b["corrected_actions"][:real] = 0.7
        b["oracle_stop"][:real] = 1.0
        b["valid_mask"][:real] = 1.0
        bound = trainer._bound_policy()
        a, s, x, _ = _flat_losses(
            bound, jax.device_get(trainer.state.params),
            {k: jnp.asarray(v) for k, v in b.items()},
            trainer.policy.initial_hidden(B),
            progress_alpha=1.0, use_progress=False,
        )
        return float(a), float(s)

    a_full, s_full = losses_for(2, 2)
    a_pad, s_pad = losses_for(8, 2)  # 2 real + 6 padded
    np.testing.assert_allclose(a_pad, a_full, rtol=1e-5)
    np.testing.assert_allclose(s_pad, s_full, rtol=1e-5)


def test_shared_trunk_forward_equivalence(tmp_path, rng):
    """TPU.SHARE_FROZEN_TRUNKS: with bitwise-identical trunk weights, the
    shared one-pass-per-modality step must produce EXACTLY the losses of the
    faithful two-pass forward; with differing trunks the guard disables
    sharing."""
    import jax.numpy as jnp

    from robo_vln_tpu.models import frozen_trunks_identical
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer
    from robo_vln_tpu.training.hierarchical_trainer import _bind
    from robo_vln_tpu.training.steps import _hier_losses
    from robo_vln_tpu.training.trainer import _dummy_batch

    cfg = tiny_config(tmp_path, trainer="hierarchical_trainer", batch_size=1,
                      hw=32)
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.freeze()
    trainer = HierarchicalTrainer(cfg)
    trainer._setup_policy()

    # random inits differ -> the guard must refuse to share
    assert trainer._maybe_trunk_fn() is None
    assert not frozen_trunks_identical(
        trainer.state.high.params, trainer.state.low.params,
        trainer._high_extra, trainer._low_extra,
    )

    # sync the trunks (the production invariant: same pretrained files) with
    # COPIES — aliased buffers break donated steps (donate-twice error)
    copy = lambda t: jax.tree.map(lambda x: np.array(x), t)  # noqa: E731
    lp = jax.tree.map(lambda x: x, trainer.state.low.params)
    hp = trainer.state.high.params
    lp["rgb_encoder"]["cnn"] = copy(hp["rgb_encoder"]["cnn"])
    lp["depth_encoder"]["visual_encoder"] = copy(
        hp["depth_encoder"]["visual_encoder"]
    )
    low_extra = dict(trainer._low_extra)
    bs = jax.tree.map(lambda x: x, low_extra["batch_stats"])
    bs["rgb_encoder"]["cnn"] = copy(
        trainer._high_extra["batch_stats"]["rgb_encoder"]["cnn"]
    )
    low_extra["batch_stats"] = bs
    trainer._low_extra = low_extra
    trainer.state = trainer.state._replace(
        low=trainer.state.low._replace(params=lp)
    )
    trunk_fn = trainer._maybe_trunk_fn()
    assert trunk_fn is not None

    gb = trainer.global_batch
    batch = _dummy_batch(cfg, gb, t=3)
    batch["rgb"] = rng.integers(0, 255, batch["rgb"].shape).astype(np.uint8)
    batch["depth"] = rng.random(batch["depth"].shape).astype(np.float16)
    batch["corrected_actions"][:] = 0.4
    batch["oracle_stop"][:] = 0.0
    batch["valid_mask"][:] = 1.0
    batch["vln_oracle_action_sensor"][:] = 2.0
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    high_b = _bind(trainer.high, trainer._high_extra)
    low_b = _bind(trainer.low, trainer._low_extra)
    hh = trainer.high.initial_hidden(gb)
    lh = trainer.low.initial_hidden(gb)

    def losses(tf):
        out = _hier_losses(
            high_b, low_b, trainer.state.high.params, trainer.state.low.params,
            batch, hh, lh, trunk_fn=tf,
        )
        return [float(out[0]), float(out[1]), float(out[2]), float(out[5])]

    shared = losses(trunk_fn)
    twopass = losses(None)
    np.testing.assert_allclose(shared, twopass, rtol=1e-5, atol=1e-6)


def test_flat_trainer_with_parallel_loader(tmp_path, rng):
    """End-to-end epoch through DAGGER.LOADER_WORKERS=2: worker processes
    collate into shared memory, window_stream prefetch device_puts from the
    segments, and the refcount finalizer recycles them mid-epoch.  Pins the
    trainer-side lifetime contract (device_put copies, so a recycled segment
    can never alias live device data — probed for the CPU backend too)."""
    a = np.ones(64, np.float32)
    x = jax.device_put(a)
    a[:] = 2.0
    assert float(np.asarray(x)[0]) == 1.0, "device_put must copy host buffers"

    cfg = tiny_config(tmp_path)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.DAGGER.LOADER_WORKERS = 2
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng)
    fill_buffer(cfg.DAGGER.LMDB_EVAL_DIR, rng, n_eps=8)

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    trainer.train()

    import json

    metrics = [
        json.loads(l)
        for l in open(os.path.join(cfg.TENSORBOARD_DIR, "metrics.jsonl"))
    ]
    totals = [m["value"] for m in metrics if m["tag"] == "Total Loss"]
    assert len(totals) >= 3
    assert all(np.isfinite(t) for t in totals)
    # learning signal, robust to worker-order nondeterminism (the last step
    # alone can flake above the first on this tiny run)
    assert min(totals[1:]) < totals[0]


def test_valid_mask_velocity_mse_flag_wires_both_trainers(
    tmp_path, rng, monkeypatch
):
    """TPU.VALID_MASK_VELOCITY_MSE threads into both trainers' jitted steps;
    default-off keeps the reference's zero-target masking exactly."""
    from robo_vln_tpu.training import steps as steps_lib
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    captured = {}
    for name in ("make_hier_train_step", "make_flat_train_step"):
        orig = getattr(steps_lib, name)

        def spy(*a, _orig=orig, _name=name, **k):
            captured[_name] = k.get("valid_velocity_mse")
            return _orig(*a, **k)

        monkeypatch.setattr(steps_lib, name, spy)

    for flag in (True, False):
        cfg = tiny_config(
            tmp_path / f"h{flag}", trainer="hierarchical_trainer",
            batch_size=1, hw=32,
        )
        cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
        cfg.TPU.VALID_MASK_VELOCITY_MSE = flag
        cfg.freeze()
        HierarchicalTrainer(cfg)._setup_policy()
        assert captured["make_hier_train_step"] == flag

        cfg = tiny_config(tmp_path / f"f{flag}", batch_size=1)
        cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
        cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
        cfg.TPU.VALID_MASK_VELOCITY_MSE = flag
        cfg.freeze()
        RoboVLNTrainer(cfg)._setup_policy()
        assert captured["make_flat_train_step"] == flag
