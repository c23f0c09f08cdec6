"""Jitted, mesh-sharded train/val steps.

One call = one TBPTT window (reference semantics: optimizer step per split,
robo_vln_trainer.py:614-648).  Static-shape bucketing (data/loader.py) makes
every window the same shape, so each step function compiles exactly once.

Data-parallel layout: batches sharded over the "data" mesh axis, params and
optimizer state replicated — the GSPMD partitioner inserts the gradient
all-reduces over ICI (replacing the reference's never-used NCCL DDP stanza,
SURVEY.md §2.6).  Buffers are donated so params/opt-state update in place.

Losses reproduce the reference's masking exactly (ops/losses.py).  The
hierarchical step trains BOTH modules in one XLA program — the reference's
cuda:0 -> cuda:1 crossing (hierarchical_trainer.py:517-521) does not exist.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from robo_vln_tpu.ops import losses
from robo_vln_tpu.training import optimizers as opt_lib


def _dropout_key(step):
    """Per-step dropout key on the TPU hardware RNG (jax's "rbg" impl).

    The default threefry2x32 impl computes the dropout mask bits with a
    counter-based hash whose cost is real: 13.4 ms of the 35.97 ms
    feature-mode HCM train step at B=4,T=50 — 37% of the step spent
    generating random bits (benchmarks/feature_step_profile.py, grads_drop
    29.8 ms vs grads 16.4 ms).  "rbg" lowers bit generation to XLA's
    RngBitGenerator (the accelerator's hardware PRNG) while keeping
    threefry-based fold_in/split, so dropout stays deterministic per
    (seed, step) — only the bit stream differs, which nothing depends on
    (the reference's torch RNG stream is different anyway).
    """
    return jax.random.fold_in(jax.random.key(17, impl="rbg"), step)


def _pad_episode_correction(batch):
    """Tail batches pad the BATCH axis with empty episodes (data/loader.py).
    The velocity MSE keeps the reference's mean-over-everything denominator
    (robo_vln_trainer.py:521-527 — time padding dilutes there too), so padded
    EPISODES would shrink it relative to the count-normalized stop/CE losses;
    rescale by B/real_B (exactly 1.0 on full batches)."""
    valid = batch["valid_mask"]
    real_b = jnp.maximum(jnp.sum(jnp.any(valid > 0, axis=1)), 1)
    return valid.shape[0] / real_b.astype(jnp.float32)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class HierTrainState(NamedTuple):
    high: TrainState
    low: TrainState


def _velocity_mse(actions, batch, valid_velocity_mse: bool):
    """Reference zero-target masking by default; per-step validity masking
    behind TPU.VALID_MASK_VELOCITY_MSE (ops/losses.validmask_velocity_mse —
    required when the expert emits exact-zero components on real steps)."""
    pred = actions.reshape(-1, 2)
    corrected = batch["corrected_actions"].reshape(-1, 2)
    if valid_velocity_mse:
        return losses.validmask_velocity_mse(
            pred, corrected, batch["valid_mask"].reshape(-1)
        )
    return losses.masked_velocity_mse(pred, corrected) \
        * _pad_episode_correction(batch)


def _flat_losses(policy, params, batch, hidden, dropout_rng=None, *,
                 progress_alpha, use_progress, valid_velocity_mse=False):
    obs = {
        k: batch[k]
        for k in batch
        if k not in (
            "prev_actions", "corrected_actions", "oracle_stop",
            "not_done_masks", "valid_mask",
        )
    }
    kwargs = {}
    if dropout_rng is not None:  # training: dropout active (reference trains
        # with nn.Dropout live; eval/val stay deterministic)
        kwargs = {"deterministic": False, "rngs": {"dropout": dropout_rng}}
    actions, stop, new_hidden, aux = policy.apply(
        {"params": params}, obs, hidden, batch["prev_actions"],
        batch["not_done_masks"], **kwargs,
    )
    corrected = batch["corrected_actions"].reshape(-1, 2)
    action_loss = _velocity_mse(actions, batch, valid_velocity_mse)
    stop_loss = losses.masked_stop_bce(
        stop.reshape(-1, 1), batch["oracle_stop"].reshape(-1, 1)
    )
    aux_loss = jnp.asarray(0.0)
    if use_progress and "progress_hat" in aux:
        aux_mask = corrected[:, 0] != 0  # reference aux_mask (:531-532)
        aux_loss = progress_alpha * losses.progress_monitor_mse(
            aux["progress_hat"].reshape(-1),
            batch["progress"].reshape(-1),
            aux_mask,
        )
    return action_loss, stop_loss, aux_loss, new_hidden


def make_flat_train_step(policy, tx, mesh, use_progress=False,
                         progress_alpha=1.0, donate=True, remat=False,
                         valid_velocity_mse=False, unfrozen=()):
    """Returns jitted (state, hidden, batch, lr) -> (state, hidden, metrics).

    remat=True (TPU.REMAT): the whole forward is rematerialized in the
    backward pass (jax.checkpoint) — activations of the 100-step TBPTT window
    are not kept live, trading ~1/3 more FLOPs for the activation memory that
    otherwise caps per-chip batch at 224x224 frames."""

    losses_fn = functools.partial(
        _flat_losses, policy,
        progress_alpha=progress_alpha, use_progress=use_progress,
        valid_velocity_mse=valid_velocity_mse,
    )
    if remat:
        losses_fn = jax.checkpoint(losses_fn)

    def step_fn(state: TrainState, hidden, batch, lr):
        dropout_rng = _dropout_key(state.step)

        def loss_fn(params):
            a, s, x, new_hidden = losses_fn(params, batch, hidden, dropout_rng)
            return a + s + x, (a, s, x, new_hidden)

        grads, (a, s, x, new_hidden) = jax.grad(loss_fn, has_aux=True)(state.params)
        # failure guard: skip the update on a non-finite loss (the reference's
        # ad-hoc try/except retry, robo_vln_trainer.py:658-694, done inline)
        finite = jnp.isfinite(a + s + x)
        updates, opt_state = opt_lib.apply_updates(
            tx, grads, state.opt_state, state.params, lr
        )
        # frozen leaves pass through UNTOUCHED (not p + 0): with donation XLA
        # aliases them input->output instead of re-writing ~150M pretrained
        # params to HBM every step, and their (zero) grad chains become dead
        # code — measured ~3 ms of the feature-mode step
        # (benchmarks/feature_step_profile.py `opt`)
        mask = opt_lib.trainable_mask(state.params, unfrozen=unfrozen)
        params = jax.tree.map(
            lambda p, u, m: p + jnp.where(finite, u, 0.0) if m else p,
            state.params, updates, mask,
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "shape") else new,
            opt_state, state.opt_state,
        )
        metrics = {"action_loss": a, "stop_loss": s, "aux_loss": x,
                   "total_loss": a + s + x, "skipped_nonfinite": 1.0 - finite}
        return TrainState(params, opt_state, state.step + 1), new_hidden, metrics

    donate_args = (0, 1) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_args)


def make_flat_val_step(policy, use_progress=False, progress_alpha=1.0,
                       valid_velocity_mse=False):
    def step_fn(params, hidden, batch):
        a, s, x, new_hidden = _flat_losses(
            policy, params, batch, hidden,
            progress_alpha=progress_alpha, use_progress=use_progress,
            valid_velocity_mse=valid_velocity_mse,
        )
        return new_hidden, {"action_loss": a, "stop_loss": s, "aux_loss": x,
                            "total_loss": a + s + x}

    return jax.jit(step_fn)


def _hier_losses(high, low, high_params, low_params, batch,
                 high_hidden, low_hidden, dropout_rng=None, trunk_fn=None,
                 inflection_coef=None, valid_velocity_mse=False):
    obs = {
        k: batch[k]
        for k in batch
        if k not in (
            "prev_actions", "corrected_actions", "oracle_stop",
            "not_done_masks", "valid_mask", "vln_oracle_action_sensor",
        )
    }
    if trunk_fn is not None and "rgb" in obs:
        # frozen conv trunks computed ONCE, consumed by BOTH policies
        # (models.make_shared_trunk_fn — the reference runs them twice).
        # Feature-store batches (training/featurize.py) arrive with the
        # features already materialized and no raw frames.
        obs = {**obs, **trunk_fn(high_params, obs)}
    oracle = batch["vln_oracle_action_sensor"]
    b, t = batch["not_done_masks"].shape
    oracle_flat = oracle.reshape(-1).astype(jnp.int32)

    kwargs = {}
    if dropout_rng is not None:  # training: dropout live in the cross-modal
        # attention stack + LanguageEncoder (reference transformer.py dropouts)
        kwargs = {"deterministic": False, "rngs": {"dropout": dropout_rng}}
    logits, new_high_hidden = high.apply(
        {"params": high_params}, obs, high_hidden, batch["prev_actions"],
        batch["not_done_masks"], **kwargs,
    )
    # opt-in deviation (TPU.APPLY_INFLECTION_WEIGHTS): up-weight sub-goal
    # transitions in the CE — the reference computes these weights but never
    # applies them (PARITY.md preserved no-op)
    iw = (losses.inflection_weights(
              oracle.reshape(b, t), inflection_coef).reshape(-1)
          if inflection_coef is not None else None)
    hl_loss = losses.subgoal_cross_entropy(
        logits.reshape(-1, 4), oracle_flat, weights=iw
    )

    # low level consumes oracle sub-goals: (sensor-1), pad 0 -> index 4
    disc = jnp.where(oracle_flat == 0, 4, oracle_flat - 1).reshape(b, t)
    actions, stop, new_low_hidden = low.apply(
        {"params": low_params}, obs, low_hidden, batch["prev_actions"],
        batch["not_done_masks"], disc,
    )
    ll_action = _velocity_mse(actions, batch, valid_velocity_mse)
    ll_stop = losses.masked_stop_bce(
        stop.reshape(-1, 1), batch["oracle_stop"].reshape(-1, 1)
    )
    # high-level accuracy on non-ignored steps (val metric, :583-588)
    pred = jnp.argmax(logits.reshape(-1, 4), axis=1)
    valid = oracle_flat != 0
    correct = jnp.sum((pred == oracle_flat - 1) & valid)
    total = jnp.maximum(jnp.sum(valid), 1)
    return (hl_loss, ll_action, ll_stop, new_high_hidden, new_low_hidden,
            correct / total)


def make_hier_train_step(high, low, tx_high, tx_low, mesh, donate=True,
                         remat=False, trunk_fn=None, inflection_coef=None,
                         valid_velocity_mse=False, unfrozen=()):
    """One program, two optimizers (AdamW high / Adam low), two LRs.

    remat=True (TPU.REMAT): rematerialize the forward in the backward pass
    (see make_flat_train_step).
    trunk_fn: shared frozen-trunk forward (TPU.SHARE_FROZEN_TRUNKS) — halves
    the dominant ResNet FLOPs when both policies hold identical trunks.
    inflection_coef: when set (TPU.APPLY_INFLECTION_WEIGHTS), the high-level
    CE is inflection-weighted (ops/losses.inflection_weights) — an explicit
    deviation from the reference, which never applies its computed weights."""

    losses_fn = functools.partial(_hier_losses, high, low, trunk_fn=trunk_fn,
                                  inflection_coef=inflection_coef,
                                  valid_velocity_mse=valid_velocity_mse)
    if remat:
        losses_fn = jax.checkpoint(losses_fn)

    def step_fn(state: HierTrainState, high_hidden, low_hidden, batch,
                lr_high, lr_low):
        # The high-level loss is independent of low-level params and vice
        # versa (the low level trains on ORACLE sub-goals,
        # hierarchical_trainer.py:522-535), so one combined grad equals the
        # reference's two sequential backward passes while sharing the forward.
        dropout_rng = _dropout_key(state.high.step)

        def loss_fn(both):
            hp, lp = both
            out = losses_fn(hp, lp, batch, high_hidden, low_hidden, dropout_rng)
            return out[0] + out[1] + out[2], out

        (hgrads, lgrads), out = jax.grad(loss_fn, has_aux=True)(
            (state.high.params, state.low.params)
        )
        hl_loss, ll_action, ll_stop, new_hh, new_lh, acc = out
        finite = jnp.isfinite(hl_loss + ll_action + ll_stop)

        hupd, hopt = opt_lib.apply_updates(
            tx_high, hgrads, state.high.opt_state, state.high.params, lr_high
        )
        lupd, lopt = opt_lib.apply_updates(
            tx_low, lgrads, state.low.opt_state, state.low.params, lr_low
        )

        def guarded(new, old):
            return jnp.where(finite, new, old) if hasattr(new, "shape") else new

        # frozen leaves (BERT + both conv trunks, the bulk of the 176.8M
        # params) pass through untouched — donation aliases them, and their
        # zero-grad chains dead-code-eliminate (see make_flat_train_step)
        hmask = opt_lib.trainable_mask(state.high.params, unfrozen=unfrozen)
        lmask = opt_lib.trainable_mask(state.low.params, unfrozen=unfrozen)

        def upd(p, u, m):
            return p + jnp.where(finite, u, 0.0) if m else p

        new_state = HierTrainState(
            TrainState(
                jax.tree.map(upd, state.high.params, hupd, hmask),
                jax.tree.map(guarded, hopt, state.high.opt_state),
                state.high.step + 1,
            ),
            TrainState(
                jax.tree.map(upd, state.low.params, lupd, lmask),
                jax.tree.map(guarded, lopt, state.low.opt_state),
                state.low.step + 1,
            ),
        )
        metrics = {
            "high_level_loss": hl_loss,
            "low_level_action_loss": ll_action,
            "low_level_stop_loss": ll_stop,
            "low_level_total_loss": ll_action + ll_stop,
            "high_level_accuracy": acc,
        }
        return new_state, new_hh, new_lh, metrics

    donate_args = (0, 1, 2) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_args)


def make_hier_val_step(high, low, trunk_fn=None, valid_velocity_mse=False):
    def step_fn(high_params, low_params, high_hidden, low_hidden, batch):
        hl, lla, lls, nhh, nlh, acc = _hier_losses(
            high, low, high_params, low_params, batch, high_hidden, low_hidden,
            trunk_fn=trunk_fn, valid_velocity_mse=valid_velocity_mse,
        )
        return nhh, nlh, {
            "high_level_loss": hl,
            "low_level_action_loss": lla,
            "low_level_stop_loss": lls,
            "low_level_total_loss": lla + lls,
            "high_level_accuracy": acc,
        }

    return jax.jit(step_fn)
