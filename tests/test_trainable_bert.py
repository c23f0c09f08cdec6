"""MODEL.BERT.trainable (docs/PARITY.md deviation) + the DAgger iteration
plan.

The reference always freezes BERT (language_encoder.py:42 no-grad;
seq2seq_highlevel_cma.py:192-196); trainable=True lifts the stop_gradient
AND the optimizer mask so the instruction pathway trains end-to-end — the
convergence study's only route to language grounding when no pretrained
BERT weights exist in the image.
"""

import jax
import numpy as np
import pytest

from tests.test_trainers import fill_buffer, tiny_config


def _subtree(params, name):
    """First subtree keyed `name` anywhere in the pytree."""
    if isinstance(params, dict):
        if name in params:
            return params[name]
        for v in params.values():
            found = _subtree(v, name)
            if found is not None:
                return found
    return None


def _leaf_equal(a, b):
    return all(
        np.array_equal(x, y)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _train_flat_bert(tmp_path, rng, trainable):
    cfg = tiny_config(tmp_path, batch_size=1)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = True
    cfg.MODEL.BERT.trainable = trainable
    cfg.freeze()
    fill_buffer(cfg.DAGGER.LMDB_FEATURES_DIR, rng, n_eps=8)

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    # init is deterministic given TASK_CONFIG.SEED (no pretrained files in
    # the image), so a fresh setup of the same config IS the pre-training
    # parameter snapshot
    fresh = RoboVLNTrainer(cfg)
    fresh._setup_policy()
    before = jax.device_get(fresh.state.params)

    trainer = RoboVLNTrainer(cfg)
    trainer.train()
    after = jax.device_get(trainer.state.params)
    return before, after


def test_bert_frozen_by_default(tmp_path, rng):
    before, after = _train_flat_bert(tmp_path, rng, trainable=False)
    bert_b = _subtree(before, "embedding_layer")
    bert_a = _subtree(after, "embedding_layer")
    assert bert_b is not None and bert_a is not None
    # reference behavior: the BERT subtree is bitwise untouched ...
    assert _leaf_equal(bert_b, bert_a)
    # ... while the trainable stack moved
    assert not _leaf_equal(before, after)


def test_bert_trainable_updates_embedding(tmp_path, rng):
    before, after = _train_flat_bert(tmp_path, rng, trainable=True)
    bert_b = _subtree(before, "embedding_layer")
    bert_a = _subtree(after, "embedding_layer")
    assert bert_b is not None and bert_a is not None
    assert not _leaf_equal(bert_b, bert_a)


def test_trainable_bert_rejects_feature_store(tmp_path):
    cfg = tiny_config(tmp_path)
    cfg.MODEL.BERT.trainable = True
    cfg.DAGGER.PRELOAD_TRUNK_FEATURES = True
    cfg.freeze()

    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    with pytest.raises(ValueError, match="PRELOAD_TRUNK_FEATURES"):
        RoboVLNTrainer(cfg)._unfrozen_names()


def test_trainable_mask_unfrozen_names():
    from robo_vln_tpu.training import optimizers as opt_lib

    params = {
        "embedding_layer": {"w": np.zeros(1)},
        "cnn": {"w": np.zeros(1)},
        "linear": {"w": np.zeros(1)},
    }
    mask = opt_lib.trainable_mask(params)
    assert not mask["embedding_layer"]["w"] and not mask["cnn"]["w"]
    assert mask["linear"]["w"]
    mask = opt_lib.trainable_mask(params, unfrozen=("embedding_layer",))
    assert mask["embedding_layer"]["w"] and not mask["cnn"]["w"]


def test_iteration_plan_global_epochs(tmp_path):
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    cfg = tiny_config(tmp_path)
    cfg.DAGGER.EPOCHS = 4
    cfg.DAGGER.ITERATIONS = 3
    cfg.DAGGER.MAX_EPOCHS_PER_RUN = 0
    cfg.freeze()
    t = RoboVLNTrainer(cfg)
    assert t._iteration_plan(0) == [
        (0, range(0, 4)), (1, range(4, 8)), (2, range(8, 12))
    ]
    # resume mid-iteration skips fully-trained iterations
    assert t._iteration_plan(6) == [(1, range(6, 8)), (2, range(8, 12))]
    assert t._iteration_plan(12) == []


def test_iteration_plan_respects_per_run_budget(tmp_path):
    from robo_vln_tpu.training.trainer import RoboVLNTrainer

    cfg = tiny_config(tmp_path)
    cfg.DAGGER.EPOCHS = 4
    cfg.DAGGER.ITERATIONS = 3
    cfg.DAGGER.MAX_EPOCHS_PER_RUN = 3
    cfg.freeze()
    t = RoboVLNTrainer(cfg)
    # the 3-epoch budget spans the iteration boundary
    assert t._iteration_plan(6) == [(1, range(6, 8)), (2, range(8, 9))]
