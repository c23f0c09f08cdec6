"""Optimizers and LR schedules matching the reference trainers.

* flat trainer: torch.optim.Adam(lr=DAGGER.LR) (robo_vln_trainer.py:344-346);
* hierarchical high level: torch.optim.AdamW(lr, weight_decay) + CyclicLR
  (base 2e-6 -> max 1e-4, 1000 up / 30000 down, stepped once per outer batch —
  hierarchical_trainer.py:330-337,739);
* hierarchical low level: torch.optim.Adam(lr, weight_decay) — torch Adam's
  weight_decay is L2-added-to-grad, reproduced with add_decayed_weights
  *before* the adam moments.

Learning rates are injected as runtime hyperparams so the host-side scheduler
can step per-batch without recompiling the jitted train step.

Frozen parameters (the pretrained backbones) are masked out of the optimizer
entirely — torch skips grad-None params, so e.g. AdamW's decoupled decay must
not touch them.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax

FROZEN_MODULE_NAMES = ("visual_encoder", "cnn", "embedding_layer")


def trainable_mask(params: Dict, extra_frozen: tuple = (),
                   unfrozen: tuple = ()) -> Dict:
    """Pytree of bools: False on frozen (pretrained-backbone) subtrees.

    `unfrozen` removes names from the frozen set — e.g. ("embedding_layer",)
    when MODEL.BERT.trainable lifts the reference's BERT freeze
    (docs/PARITY.md deviation)."""
    frozen_names = (set(FROZEN_MODULE_NAMES) | set(extra_frozen)) \
        - set(unfrozen)

    def walk(tree, path):
        if isinstance(tree, dict):
            return {
                k: walk(v, path + (k,)) for k, v in tree.items()
            }
        return not any(p in frozen_names for p in path)

    return walk(params, ())


def masked(tx: optax.GradientTransformation, params: Dict,
           extra_frozen: tuple = (),
           unfrozen: tuple = ()) -> optax.GradientTransformation:
    """Run tx on trainable params only; frozen leaves get a hard-zero update
    (optax.masked alone would pass their raw gradient through)."""
    mask = trainable_mask(params, extra_frozen, unfrozen)
    inverse = jax.tree.map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), inverse),
    )


def adam(weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam semantics (L2 folded into the gradient)."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(_scale_by_injected_lr())
    return optax.chain(*chain)


def adamw(weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.AdamW semantics (decoupled decay, applied with lr)."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
        _scale_by_injected_lr(),
    )


def _scale_by_injected_lr() -> optax.GradientTransformation:
    """Scales by -lr where lr comes from the update's `lr` kwarg-like state.

    Implemented via optax.inject_hyperparams-free plumbing: the trainer wraps
    updates with `with_lr` below.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None, *, lr=None):
        assert lr is not None, "pass lr= through with_lr()"
        updates = jax.tree.map(lambda u: -lr * u, updates)
        return updates, state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def apply_updates(tx, grads, opt_state, params, lr):
    """tx.update with the runtime learning rate threaded through."""
    return tx.update(grads, opt_state, params, lr=lr)


def cyclic_triangular_lr(
    step: int,
    base_lr: float = 2e-6,
    max_lr: float = 1e-4,
    step_size_up: int = 1000,
    step_size_down: int = 30000,
) -> float:
    """torch CyclicLR (mode='triangular', cycle_momentum=False) value at
    `step` — stepped by the host once per batch like the reference."""
    cycle_len = step_size_up + step_size_down
    pos = step % cycle_len
    if pos < step_size_up:
        frac = pos / step_size_up
    else:
        frac = 1.0 - (pos - step_size_up) / step_size_down
    return base_lr + (max_lr - base_lr) * frac
