"""Imitation-learning losses with the reference's exact masking semantics.

Every quirk of the reference loss path is reproduced deliberately (see
SURVEY.md §7 "oddities to preserve"):

* velocity MSE: predictions are zeroed wherever the *target* is exactly 0
  (robo_vln_trainer.py:521-525 ``output.masked_fill_(corrected_actions==0, 0)``)
  and the mean runs over ALL elements, padded ones included — padded terms
  contribute 0 because both sides are 0 there;
* stop BCE: computed only where oracle_stop != -1 (padding fill value,
  robo_vln_trainer.py:527-530), as a mean over selected elements;
* high-level CE: logits rows are zeroed where the oracle sub-goal is 0, labels
  are (sub_goal - 1) with ignore_index=-1 (hierarchical_trainer.py:508-511).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_velocity_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSELoss over (.., 2) velocities with zero-fill-where-target-zero.

    Mean is over the full tensor (torch nn.MSELoss() default 'mean').
    """
    keep = target != 0.0
    pred = jnp.where(keep, pred, 0.0)
    return jnp.mean((pred - target) ** 2)


def validmask_velocity_mse(
    pred: jnp.ndarray,  # (N, 2)
    target: jnp.ndarray,  # (N, 2)
    valid: jnp.ndarray,  # (N,) 1.0 on real steps, 0.0 on padding
) -> jnp.ndarray:
    """MSE over (v, omega) masked by step VALIDITY (mean over real steps).

    Opt-in deviation (TPU.VALID_MASK_VELOCITY_MSE) from the reference's
    zero-target masking (masked_velocity_mse / robo_vln_trainer.py:521-527),
    which silently drops any component whose target is exactly 0.0.  On real
    robo-vln data that quirk mostly hits padding, but a synthetic P-controller
    expert (LangNav) emits exact omega = 0.0 on every straight segment — under
    the reference mask the steering head then receives NO gradient toward
    "go straight", and the trained policy carries a persistent turn bias that
    compounds in the closed loop (round-4 probe_policy finding)."""
    keep = valid[:, None] > 0
    per = jnp.where(keep, (pred - target) ** 2, 0.0)
    denom = jnp.maximum(jnp.sum(keep) * pred.shape[-1], 1)
    return jnp.sum(per) / denom


def masked_stop_bce(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogitsLoss over elements where target != -1.

    target is {0, 1} on valid steps and -1 on padding.
    """
    valid = target != -1.0
    t = jnp.where(valid, target, 0.0)
    # log-sigmoid formulation, numerically stable
    per = jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per = jnp.where(valid, per, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per) / denom


def subgoal_cross_entropy(
    logits: jnp.ndarray,  # (N, C)
    oracle_actions: jnp.ndarray,  # (N,) raw sensor values; 0 = ignore
    weights: jnp.ndarray | None = None,  # (N,) per-step loss weights
) -> jnp.ndarray:
    """CrossEntropyLoss(ignore_index=-1) over labels = oracle_actions - 1 with
    logits rows zeroed where oracle_actions == 0 (matching the masked_fill in
    hierarchical_trainer.py:508-509 — the zeroed rows are then dropped by
    ignore_index so the fill only affects what the reference computes too).

    weights: optional per-step inflection weights (see inflection_weights);
    the reduction becomes sum(w*nll)/sum(w over non-ignored) — torch
    CrossEntropyLoss(weight=..) / habitat IW semantics.  weights=None keeps
    the reference's unweighted mean (the production default: the reference
    computes inflec_weights and never applies them, see PARITY.md)."""
    ignore = oracle_actions == 0
    labels = oracle_actions.astype(jnp.int32) - 1
    logits = jnp.where(ignore[:, None], 0.0, logits)
    logz = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logz, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(ignore, 0.0, nll)
    if weights is not None:
        nll = nll * weights
        denom = jnp.maximum(jnp.sum(jnp.where(ignore, 0.0, weights)), 1e-6)
    else:
        denom = jnp.maximum(jnp.sum(~ignore), 1)
    return jnp.sum(nll) / denom


def inflection_weights(oracle_actions: jnp.ndarray,  # (B, T) sensor values
                       coef: float) -> jnp.ndarray:
    """Per-step inflection weights over a (B, T) oracle-action window:
    weight = coef where the action differs from the previous step's (the
    window-initial step counts as an inflection), else 1.0.

    Habitat's IW recipe (vln-ce il_trainer: ``inflections = cat([1],
    actions[1:] != actions[:-1]); weights = inflec_weights[inflections]``)
    computed per full episode; here the window-initial inflection applies per
    TBPTT window (data/loader.py split_tbptt), which up-weights at most one
    extra step per window.  Only used behind TPU.APPLY_INFLECTION_WEIGHTS —
    the reference ships the coefficient but never applies it
    (hierarchical_trainer.py:183 / robo_vln_trainer.py:195, preserved no-op)."""
    prev = jnp.concatenate(
        [jnp.full_like(oracle_actions[:, :1], -1), oracle_actions[:, :-1]],
        axis=1,
    )
    return jnp.where(oracle_actions != prev, float(coef), 1.0)


def progress_monitor_mse(
    progress_hat: jnp.ndarray,  # (N,) tanh(progress head)
    progress: jnp.ndarray,  # (N,)
    mask: jnp.ndarray,  # (N,) bool — valid (non-padded) steps
) -> jnp.ndarray:
    """Aux progress-monitor loss: elementwise MSE reduced as a masked mean
    (AuxLosses.reduce, aux_losses.py:29-35 + seq2seq.py:176-185)."""
    per = (progress_hat - progress) ** 2
    per = jnp.where(mask, per, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(per) / denom
