"""Policy-mixed DAgger collection (documented deviation, default off).

The reference's DAGGER stanza carries `ITERATIONS` and `P`
(reference config/default.py:59,63), inherited from VLN-CE's DAgger trainer
where the EXECUTED action during collection is the expert's with probability
beta = P**iteration and the current policy's otherwise, while the recorded
label is always the expert's.  The reference's own `_update_dataset` never
consults P for action mixing (robo_vln_trainer.py:387-503 — rollouts are
always the waypoint P-controller; P only gates scene-repeat iterator options
at :852-866), so every paper config trains pure behavior cloning.

This module implements the true mixing semantics, enabled by setting
`DAGGER.P < 1.0` (exactly the knob the reference exposes but ignores; see
docs/PARITY.md).  Visited states then come from the mixed policy while the
supervision stays clean — DAgger's fix for the closed-loop compounding-error
regime the round-4 convergence study measured.

The policy network is stepped on EVERY collection step (its recurrent state
must track the true history), and its action is executed only when the
per-step coin exceeds beta.  `prev_actions` fed to the policy are the
EXECUTED actions (what the policy would see at eval time); the stored label
`prev_actions` remain the expert stream exactly as in pure-expert collection.

The mixer always runs on the HOST CPU backend with a one-time parameter
snapshot (collection never overlaps training, so the snapshot is the live
state): a single-sample policy step on the tunneled TPU is round-trip-
latency-bound, and the tunnel client pins every host->device transfer
buffer until process exit (docs/TPU_ENV_NOTES.md) — one obs transfer per
30 Hz sim step would leak GBs per rollout pass.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

from robo_vln_tpu.envs.obs_utils import batch_obs


class PolicyMixer:
    """Jitted single-step policy wrapper for mixed collection.

    step/reset/set_prev protocol; construction goes through `for_flat` /
    `for_hierarchical` (mirrors the eval drivers' step closures,
    eval/evaluator.py:632-666 and :754-790, without the video/attention
    machinery).
    """

    def __init__(self, step: Callable, init_state: Callable, config):
        import jax

        self._step = step  # (obs_np, state, prev, mask) -> (v, w), state
        self._init_state = init_state
        self._uuid = config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID
        self._pad_to = config.DAGGER.MAX_INSTRUCTION_LEN
        # host-CPU execution (see module docstring: tunnel latency + the
        # pinned-transfer-buffer leak make per-step TPU dispatch a non-starter)
        self._dev = jax.devices("cpu")[0]
        self.reset()

    def reset(self) -> None:
        import jax

        with jax.default_device(self._dev):
            self._state = self._init_state()
        self._prev = np.zeros((1, 2), np.float32)
        self._mask = np.zeros((1,), np.float32)

    def set_prev(self, v: float, w: float) -> None:
        """Record the EXECUTED action; consumed by the next step's forward."""
        self._prev = np.asarray([[v, w]], np.float32)
        self._mask = np.ones((1,), np.float32)

    def step(self, observations) -> Tuple[float, float]:
        """One policy tick on (already transform_obs'd) observations.

        Advances the recurrent state unconditionally; the caller decides
        whether the returned action is executed.
        """
        import jax

        keep = ("rgb", "depth", self._uuid, "progress")
        obs = {k: v for k, v in observations.items() if k in keep}
        obs = batch_obs(obs, pad_instruction_to=self._pad_to)
        obs = {k: np.asarray(v) for k, v in obs.items()}
        with jax.default_device(self._dev):
            action, self._state = self._step(obs, self._state, self._prev,
                                             self._mask)
        a = np.asarray(action)[0]
        return float(a[0]), float(a[1])

    # -- factories -----------------------------------------------------------

    @classmethod
    def for_flat(cls, trainer) -> "PolicyMixer":
        import jax

        bound = trainer._bound_policy()
        # one-time host snapshot: collection never overlaps training, and
        # live device params would force a TPU transfer per 30 Hz step
        params = jax.device_get(trainer.state.params)

        @jax.jit
        def step_fn(params, obs, hidden, prev, mask):
            actions, _stop, hidden, _ = bound.apply(
                {"params": params}, obs, hidden, prev, mask
            )
            return actions, hidden

        def step(obs, hidden, prev, mask):
            actions, hidden = step_fn(params, obs, hidden, prev, mask)
            return actions, hidden

        return cls(step, lambda: trainer.policy.initial_hidden(1),
                   trainer.config)

    @classmethod
    def for_hierarchical(cls, trainer) -> "PolicyMixer":
        import jax
        import jax.numpy as jnp

        from robo_vln_tpu.training.hierarchical_trainer import _bind

        high_b = _bind(trainer.high, trainer._high_extra)
        low_b = _bind(trainer.low, trainer._low_extra)
        trunk_fn = trainer._maybe_trunk_fn()
        uuid = trainer.config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID
        # one-time host snapshot (see for_flat)
        high_params = jax.device_get(trainer.state.high.params)
        low_params = jax.device_get(trainer.state.low.params)

        embed_fn = jax.jit(
            lambda hp, ids: high_b.apply(
                {"params": hp}, ids, method="embed_instruction"
            )
        )
        emb_cache = {"ids": None, "emb": None}

        @jax.jit
        def step_fn(hp, lp, obs, hh, lh, prev, mask):
            if trunk_fn is not None:
                obs = {**obs, **trunk_fn(hp, obs)}
            logits, hh = high_b.apply({"params": hp}, obs, hh, prev, mask)
            pred = jnp.argmax(logits, axis=-1)
            actions, _stop, lh = low_b.apply(
                {"params": lp}, obs, lh, prev, mask, pred
            )
            return actions, hh, lh

        def step(obs, state, prev, mask):
            ids = np.asarray(obs[uuid])
            if emb_cache["ids"] is None or not np.array_equal(
                emb_cache["ids"], ids
            ):
                emb_cache["ids"] = ids
                emb_cache["emb"] = embed_fn(high_params, jnp.asarray(ids))
            obs = {**obs, "instruction_embedding": emb_cache["emb"]}
            hh, lh = state
            actions, hh, lh = step_fn(
                high_params, low_params, obs, hh, lh, prev, mask,
            )
            return actions, (hh, lh)

        def init_state():
            return (
                trainer.high.initial_hidden(1),
                trainer.low.initial_hidden(1),
            )

        return cls(step, init_state, trainer.config)


def mixer_for_trainer(trainer) -> PolicyMixer:
    """Dispatch on trainer kind (flat `policy` vs hierarchical `high`/`low`)."""
    if getattr(trainer, "policy", None) is not None:
        return PolicyMixer.for_flat(trainer)
    if getattr(trainer, "high", None) is not None:
        return PolicyMixer.for_hierarchical(trainer)
    raise ValueError(
        "mixed collection needs an initialized policy "
        "(call _setup_policy first)"
    )
