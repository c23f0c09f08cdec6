"""Fused pallas LSTM: interpret-mode parity with the scan implementation and
gradient correctness of the custom VJP (scan-replay backward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robo_vln_tpu.ops.pallas_lstm import (
    _pallas_lstm_call,
    _scan_impl,
    fused_lstm_sequence,
    pallas_ok,
)


def _inputs(rng, T=6, B=3, H=128):
    gates_x = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    masks = jnp.ones((T, B)).at[0].set(0.0).at[3, 1].set(0.0)
    h0 = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
    return gates_x, masks, h0, c0, w_hh


def test_pallas_kernel_matches_scan_interpret(rng):
    args = _inputs(rng)
    outs_p, hT_p, cT_p = _pallas_lstm_call(*args, interpret=True)
    outs_s, hT_s, cT_s = _scan_impl(*args)
    np.testing.assert_allclose(np.asarray(outs_p), np.asarray(outs_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT_p), np.asarray(hT_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT_p), np.asarray(cT_s), atol=1e-5)


def test_custom_vjp_matches_scan_grad(rng):
    args = _inputs(rng, T=4, B=2, H=128)

    def loss_fused(*a):
        outs, hT, cT = fused_lstm_sequence(*a)
        return jnp.sum(outs**2) + jnp.sum(hT * cT)

    def loss_scan(*a):
        outs, hT, cT = _scan_impl(*a)
        return jnp.sum(outs**2) + jnp.sum(hT * cT)

    g_fused = jax.grad(loss_fused, argnums=(0, 2, 3, 4))(*args)
    g_scan = jax.grad(loss_scan, argnums=(0, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_ok_gating():
    assert pallas_ok(100, 8, 512)
    assert not pallas_ok(100, 8, 300)  # H not lane-aligned
