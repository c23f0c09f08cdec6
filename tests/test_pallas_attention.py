"""Fused cross-modal attention kernel: parity vs the XLA mha_attention at
HCM shapes (interpret mode on CPU), plus the custom-VJP gradient path."""

import numpy as np

import jax
import jax.numpy as jnp

from robo_vln_tpu.ops.cm_attention import attention_core, mha_attention, set_use_pallas
from robo_vln_tpu.ops.pallas_attention import (
    _pallas_attention,
    fused_cross_modal_attention,
    pallas_attention_ok,
)


def _qkv(rng, B=3, Lq=16, S=16, D=256, Dv=256):
    return (
        jnp.asarray(rng.standard_normal((B, Lq, D)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, S, Dv)), jnp.float32),
    )


def test_pallas_kernel_matches_xla(rng):
    """Kernel math (interpret mode) vs mha_attention at the HCM head layout
    (h=4, d_k=64 — the Visual_Ling_Attn configuration)."""
    q, k, v = _qkv(rng, B=3, Lq=16, S=16, D=256)
    ref = mha_attention(q, k, v, 4)
    out = _pallas_attention(q, k, v, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_depth_tokens(rng):
    """S=64 (depth tokens) and rectangular d_v."""
    q, k, v = _qkv(rng, B=2, Lq=8, S=64, D=256, Dv=128)
    ref = mha_attention(q, k, v, 2)
    out = _pallas_attention(q, k, v, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_vjp_matches_xla_grads(rng):
    """custom-VJP backward (XLA replay) == grads of mha_attention."""
    q, k, v = _qkv(rng, B=2, Lq=8, S=8, D=64)

    def loss_fused(q, k, v):
        return jnp.sum(fused_cross_modal_attention(q, k, v, 2) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_attention(q, k, v, 2) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_alignment_gate():
    assert pallas_attention_ok(200, 16, 4, 256, 256)
    assert pallas_attention_ok(200, 64, 4, 256, 256)
    assert not pallas_attention_ok(13, 16, 4, 256, 256)  # Lq not sublane-mult
    assert not pallas_attention_ok(200, 16, 3, 256, 256)  # heads don't divide


def test_attention_core_dispatch_and_masked_fallback(rng):
    """attention_core: identical results with the gate on and off on CPU
    (falls back to XLA off-TPU), and masked calls always use the XLA path."""
    q, k, v = _qkv(rng, B=2, Lq=8, S=8, D=64)
    mask = jnp.zeros((2, 1, 8, 8), bool).at[:, :, :, 6:].set(True)
    try:
        set_use_pallas(True)
        on = attention_core(q, k, v, 2)
        on_masked = attention_core(q, k, v, 2, mask)
    finally:
        set_use_pallas(False)
    off = attention_core(q, k, v, 2)
    off_masked = attention_core(q, k, v, 2, mask)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(on_masked), np.asarray(off_masked), atol=1e-6
    )
