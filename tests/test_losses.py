"""Loss masking semantics vs the torch formulations the reference trainers use
(robo_vln_trainer.py:505-542, hierarchical_trainer.py:492-560)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from robo_vln_tpu.ops import losses


def test_masked_velocity_mse(rng):
    pred = rng.standard_normal((20, 2)).astype(np.float32)
    target = rng.standard_normal((20, 2)).astype(np.float32)
    target[12:] = 0.0  # padded steps
    target[3, 1] = 0.0  # genuine zero velocity — also masked (reference quirk)

    p = torch.from_numpy(pred.copy())
    t = torch.from_numpy(target)
    p = p.masked_fill_(t == 0, 0)
    ref = nn.MSELoss()(p, t).item()

    got = float(losses.masked_velocity_mse(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_masked_stop_bce(rng):
    logits = rng.standard_normal((30, 1)).astype(np.float32)
    target = (rng.random((30, 1)) > 0.7).astype(np.float32)
    target[25:] = -1.0  # padding fill (collate_fn oracle_stop pad = -1)

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(target)
    mask = tt != -1
    ref = nn.BCEWithLogitsLoss()(
        torch.masked_select(lt, mask), torch.masked_select(tt, mask)
    ).item()

    got = float(losses.masked_stop_bce(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_subgoal_cross_entropy(rng):
    N, C = 40, 4
    logits = rng.standard_normal((N, C)).astype(np.float32)
    oracle = rng.integers(0, 5, size=(N,))  # 0 = pad/natural-stop (ignored)

    lt = torch.from_numpy(logits.copy())
    ot = torch.from_numpy(oracle)
    lt = lt.masked_fill_((ot == 0).unsqueeze(1), 0)
    ref = nn.CrossEntropyLoss(ignore_index=-1)(lt, ot.long() - 1).item()

    got = float(
        losses.subgoal_cross_entropy(jnp.asarray(logits), jnp.asarray(oracle))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_subgoal_ce_inflection_weighted(rng):
    """Weighted CE = torch sum(w*nll)/sum(w over non-ignored) (habitat IW
    reduction); coef=1 weights reduce to the unweighted reference mean."""
    N, C = 40, 4
    logits = rng.standard_normal((N, C)).astype(np.float32)
    oracle = rng.integers(0, 5, size=(N,))
    w = rng.random(N).astype(np.float32) + 0.5

    lt = torch.from_numpy(logits.copy())
    ot = torch.from_numpy(oracle)
    lt = lt.masked_fill_((ot == 0).unsqueeze(1), 0)
    nll = nn.CrossEntropyLoss(ignore_index=-1, reduction="none")(
        lt, ot.long() - 1
    )
    keep = ot != 0
    wt = torch.from_numpy(w)
    ref = (nll * wt)[keep].sum().item() / wt[keep].sum().item()

    got = float(losses.subgoal_cross_entropy(
        jnp.asarray(logits), jnp.asarray(oracle), weights=jnp.asarray(w)
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    ones = jnp.ones((N,), jnp.float32)
    np.testing.assert_allclose(
        float(losses.subgoal_cross_entropy(
            jnp.asarray(logits), jnp.asarray(oracle), weights=ones
        )),
        float(losses.subgoal_cross_entropy(
            jnp.asarray(logits), jnp.asarray(oracle)
        )),
        rtol=1e-6,
    )


def test_inflection_weights():
    """Window-initial step + every action change get the coefficient."""
    oracle = jnp.asarray([[2, 2, 3, 3, 3, 1],
                          [1, 1, 1, 1, 4, 4]], jnp.float32)
    got = np.asarray(losses.inflection_weights(oracle, 3.2))
    want = np.array([[3.2, 1.0, 3.2, 1.0, 1.0, 3.2],
                     [3.2, 1.0, 1.0, 1.0, 3.2, 1.0]], np.float32)
    np.testing.assert_allclose(got, want)


def test_progress_monitor(rng):
    N = 25
    ph = np.tanh(rng.standard_normal(N)).astype(np.float32)
    pr = rng.random(N).astype(np.float32)
    mask = rng.random(N) > 0.3

    per = nn.functional.mse_loss(
        torch.from_numpy(ph), torch.from_numpy(pr), reduction="none"
    )
    ref = torch.masked_select(per, torch.from_numpy(mask)).mean().item()
    got = float(
        losses.progress_monitor_mse(jnp.asarray(ph), jnp.asarray(pr), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_validmask_velocity_mse(rng):
    """TPU.VALID_MASK_VELOCITY_MSE deviation: masking by step validity keeps
    exact-zero targets (straight-segment omega from a P-controller expert) in
    the loss, and equals torch MSE over the valid rows."""
    pred = rng.standard_normal((20, 2)).astype(np.float32)
    target = rng.standard_normal((20, 2)).astype(np.float32)
    target[3, 1] = 0.0  # genuine zero omega — must STAY in the loss
    target[12:] = 0.0  # padding
    valid = np.zeros(20, np.float32)
    valid[:12] = 1.0

    ref = nn.MSELoss()(
        torch.from_numpy(pred[:12].copy()), torch.from_numpy(target[:12])
    ).item()
    got = float(losses.validmask_velocity_mse(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid)
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    # the zero-target component gets gradient under the valid mask...
    import jax

    g = jax.grad(
        lambda p: losses.validmask_velocity_mse(
            p, jnp.asarray(target), jnp.asarray(valid)
        )
    )(jnp.asarray(pred))
    assert abs(float(g[3, 1])) > 0.0
    # ...and none under the reference mask (the quirk this flag fixes)
    g_ref = jax.grad(
        lambda p: losses.masked_velocity_mse(p, jnp.asarray(target))
    )(jnp.asarray(pred))
    assert float(g_ref[3, 1]) == 0.0
    # padding stays excluded either way
    assert float(jnp.abs(g[12:]).sum()) == 0.0
