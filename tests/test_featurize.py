"""Feature-store training mode (training/featurize.py): trunk features
precomputed once per buffer, trained from forever after.  Correctness pin:
feature-mode losses match the raw-frame shared-trunk step to f16 storage
tolerance; the cache invalidates on trunk-weight changes."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_trainers import fill_buffer, tiny_config


def _synced_hier_trainer(tmp_path, hw=32):
    from robo_vln_tpu.training.hierarchical_trainer import HierarchicalTrainer

    cfg = tiny_config(tmp_path, trainer="hierarchical_trainer", batch_size=1,
                      hw=hw)
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.freeze()
    trainer = HierarchicalTrainer(cfg)
    trainer._setup_policy()
    # production invariant: both modules' frozen trunks from the same files.
    # COPIES, not aliases — the donated train step must never see one buffer
    # twice (XLA "donate the same buffer twice" error)
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
    return cfg, trainer


def test_feature_mode_losses_match_raw(tmp_path, rng):
    from robo_vln_tpu.training.hierarchical_trainer import _bind
    from robo_vln_tpu.training.steps import _hier_losses

    cfg, trainer = _synced_hier_trainer(tmp_path)
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=3, hw=32)

    feat_dir, _ = trainer._featurized_dirs()
    assert feat_dir != trainer.features_dir
    assert os.path.exists(os.path.join(feat_dir, "featurize_meta.json"))

    raw_batch = next(iter(trainer._batches(trainer.features_dir, seed=0)))
    feat_batch = next(iter(trainer._batches(feat_dir, seed=0)))
    assert "rgb" not in feat_batch and "rgb_features" in feat_batch
    assert feat_batch["rgb_features"].dtype == np.float16
    # BERT model -> the per-episode frozen instruction embedding is stored
    # too and flows through collate as an episode-level (B, L, D) key
    emb = feat_batch["instruction_embedding"]
    assert emb.dtype == np.float16
    assert emb.shape[:2] == feat_batch["instruction"].shape
    np.testing.assert_array_equal(
        raw_batch["corrected_actions"], feat_batch["corrected_actions"]
    )

    high_b = _bind(trainer.high, trainer._high_extra)
    low_b = _bind(trainer.low, trainer._low_extra)
    gb = trainer.global_batch
    hh = trainer.high.initial_hidden(gb)
    lh = trainer.low.initial_hidden(gb)
    trunk_fn = trainer._maybe_trunk_fn()
    assert trunk_fn is not None

    def losses(batch, tf):
        out = _hier_losses(
            high_b, low_b, trainer.state.high.params, trainer.state.low.params,
            {k: jnp.asarray(v) for k, v in batch.items()}, hh, lh, trunk_fn=tf,
        )
        return np.array([float(out[0]), float(out[1]), float(out[2])])

    raw = losses(raw_batch, trunk_fn)
    feat = losses(feat_batch, trunk_fn)  # "rgb" absent -> trunk_fn unused
    np.testing.assert_allclose(feat, raw, rtol=2e-2, atol=2e-3)  # f16 storage


def test_feature_store_instruction_embedding_parity(tmp_path, rng):
    """The stored instruction_embedding row IS BERT over the collated ids:
    the fast path and the in-model embed path agree to f16 storage
    tolerance, so training from the store matches the full forward."""
    cfg, trainer = _synced_hier_trainer(tmp_path)
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=2, hw=32)

    feat_dir, _ = trainer._featurized_dirs()
    feat_batch = next(iter(trainer._batches(feat_dir, seed=0)))

    from robo_vln_tpu.training.hierarchical_trainer import _bind

    high_b = _bind(trainer.high, trainer._high_extra)
    ref = high_b.apply(
        {"params": trainer.state.high.params},
        jnp.asarray(feat_batch["instruction"]),
        method="embed_instruction",
    )
    # tail-padding episodes carry a ZERO embedding row (collate) while the
    # in-model path runs BERT over their all-zero ids — every loss masks
    # those episodes out, so parity is over the real episodes only
    real = feat_batch["valid_mask"].any(axis=1)
    assert real.sum() == 2
    # f16 storage + reassociation across different batch shapes (the store
    # embeds (1, L), the model (B, L)) through 12 attention layers
    np.testing.assert_allclose(
        np.asarray(feat_batch["instruction_embedding"], np.float32)[real],
        np.asarray(ref, np.float32)[real],
        rtol=5e-3, atol=1e-2,
    )


def test_feature_cache_fingerprint_invalidation(tmp_path, rng):
    from robo_vln_tpu.training.featurize import ensure_featurized, trunk_fingerprint

    cfg, trainer = _synced_hier_trainer(tmp_path)
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=2, hw=32)
    params = jax.device_get(trainer.state.high.params)

    d1 = ensure_featurized(cfg, jnp.float32, params, trainer._high_extra,
                           trainer.features_dir)
    meta1 = json.load(open(os.path.join(d1, "featurize_meta.json")))
    # second call: cache hit, identical meta
    d2 = ensure_featurized(cfg, jnp.float32, params, trainer._high_extra,
                           trainer.features_dir)
    assert d1 == d2
    assert json.load(open(os.path.join(d1, "featurize_meta.json"))) == meta1

    # perturb a trunk weight -> new fingerprint -> rebuild
    params2 = jax.tree.map(lambda x: x, params)
    k = params2["rgb_encoder"]["cnn"]["conv1"]["kernel"]
    params2["rgb_encoder"]["cnn"]["conv1"]["kernel"] = np.asarray(k) + 1.0
    assert trunk_fingerprint(params2, trainer._high_extra) != meta1["fingerprint"]
    ensure_featurized(cfg, jnp.float32, params2, trainer._high_extra,
                      trainer.features_dir)
    meta2 = json.load(open(os.path.join(d1, "featurize_meta.json")))
    assert meta2["fingerprint"] != meta1["fingerprint"]


def test_flat_trainer_feature_mode_end_to_end(tmp_path, rng):
    """run the flat trainer fully in feature mode: featurize -> train ->
    checkpoint, loss finite and params update."""
    cfg = tiny_config(tmp_path, batch_size=1, hw=32)
    cfg.DAGGER.PRELOAD_TRUNK_FEATURES = True
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=4, hw=32)
    fill_buffer(cfg.DAGGER.LMDB_EVAL_DIR, rng, n_eps=2, hw=32)

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    trainer = RoboVLNTrainer(cfg)
    trainer.train()
    assert os.path.isdir(cfg.DAGGER.LMDB_FEATURES_DIR + ".features")
    metrics = [
        json.loads(l)
        for l in open(os.path.join(cfg.TENSORBOARD_DIR, "metrics.jsonl"))
    ]
    totals = [m["value"] for m in metrics if m["tag"] == "Total Loss"]
    assert totals and np.isfinite(totals).all()


@pytest.mark.slow  # full hier train loop; core parity covered by the fast tests
def test_hier_trainer_feature_mode_end_to_end(tmp_path, rng):
    """Hierarchical trainer fully in feature mode: trunks synced (production
    invariant), buffer featurized once, training runs from features."""
    cfg, trainer = _synced_hier_trainer(tmp_path)
    cfg.defrost()
    cfg.DAGGER.PRELOAD_TRUNK_FEATURES = True
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=4, hw=32)

    from robo_vln_tpu.utils.logging import MetricsWriter

    train_dir, _ = trainer._featurized_dirs()
    assert train_dir.endswith(".features")
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        trainer.train_epoch(trainer._batches(train_dir, seed=0), 0, writer, 0)
    metrics = [
        json.loads(l)
        for l in open(os.path.join(cfg.TENSORBOARD_DIR, "metrics.jsonl"))
    ]
    hl = [m["value"] for m in metrics
          if m["tag"] == "Train High Level Action Loss"]
    assert hl and np.isfinite(hl).all()


def test_feature_cache_stale_on_instruction_len_change(tmp_path, rng):
    """The stored BERT rows bake the pad length in (pad tokens attended),
    so changing DAGGER.MAX_INSTRUCTION_LEN must invalidate a BERT-model
    feature cache."""
    from robo_vln_tpu.training.featurize import ensure_featurized

    cfg, trainer = _synced_hier_trainer(tmp_path)
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=2, hw=32)
    params = jax.device_get(trainer.state.high.params)

    d = ensure_featurized(cfg, jnp.float32, params, trainer._high_extra,
                          trainer.features_dir)
    meta = json.load(open(os.path.join(d, "featurize_meta.json")))
    assert meta["max_instruction_len"] == cfg.DAGGER.MAX_INSTRUCTION_LEN

    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.DAGGER.MAX_INSTRUCTION_LEN = cfg.DAGGER.MAX_INSTRUCTION_LEN + 7
    cfg2.freeze()
    d2 = ensure_featurized(cfg2, jnp.float32, params, trainer._high_extra,
                           trainer.features_dir)
    meta2 = json.load(open(os.path.join(d2, "featurize_meta.json")))
    assert meta2["max_instruction_len"] == cfg2.DAGGER.MAX_INSTRUCTION_LEN

    from robo_vln_tpu.data import serialization
    from robo_vln_tpu.data.trajectory_store import TrajectoryStore

    with TrajectoryStore(d2) as store:
        raw = store.get_buffer(0)
        # the feature store is written in the flat wire format
        assert serialization.is_flat(raw)
        obs, *_ = serialization.unpackb_any(raw)
    assert obs["instruction_embedding"].shape[0] == \
        cfg2.DAGGER.MAX_INSTRUCTION_LEN


def test_feature_cache_incremental_append(tmp_path, rng):
    """Append-only buffer growth (the DAgger collect->train loop) featurizes
    ONLY the new tail; existing feature episodes are byte-identical."""
    from robo_vln_tpu.data.loader import write_episode
    from robo_vln_tpu.data.trajectory_store import TrajectoryStore
    from robo_vln_tpu.training.featurize import ensure_featurized

    cfg, trainer = _synced_hier_trainer(tmp_path)
    buf = cfg.DAGGER.LMDB_FEATURES_DIR
    fill_buffer(buf, rng, n_eps=2, hw=32)
    params = jax.device_get(trainer.state.high.params)

    d = ensure_featurized(cfg, jnp.float32, params, trainer._high_extra, buf)
    with TrajectoryStore(d) as store:
        assert len(store) == 2
        ep0_before = store.get(0)

    # append two more episodes (collection appends at len(store), never
    # rewrites existing keys)
    def episode(t=6, hw=32, instr_len=10):
        obs = {
            "rgb": rng.integers(0, 255, (t, hw, hw, 3)).astype(np.uint8),
            "depth": rng.random((t, hw, hw, 1)).astype(np.float16),
            "progress": np.linspace(0, 1, t).astype(np.float32),
            "vln_oracle_action_sensor": rng.integers(1, 4, (t, 1)).astype(
                np.float64
            ),
            "instruction": np.tile(
                rng.integers(1, 50, (1, instr_len)).astype(np.float64), (t, 1)
            ),
        }
        return obs, rng.random((t, 2)), rng.random((t, 2)), [t - 1] * t

    with TrajectoryStore(buf, writable=True) as store:
        for k in (2, 3):
            write_episode(store, k, *episode())
        store.flush()

    d2 = ensure_featurized(cfg, jnp.float32, params, trainer._high_extra, buf)
    assert d2 == d
    meta = json.load(open(os.path.join(d, "featurize_meta.json")))
    assert meta["episodes"] == 4
    with TrajectoryStore(d) as store:
        assert len(store) == 4
        assert store.get(0) == ep0_before  # untouched, not recomputed
        assert store.get(3)  # new tail featurized
