"""Fused cross-modal attention pallas kernel: QK^T -> softmax -> AV in VMEM.

The HCM hot attention (VisualLingAttn core — reference ScaledDotProductAttention,
transformer/transformer.py:81-109) is L<=200 instruction queries over S in
{16, 64} visual tokens per frame, h=4 heads of d_k=64.  Under plain XLA the
(N, h, L, S) logits and attention-weight tensors round-trip HBM between the
two matmuls; this kernel keeps one (example, head)'s whole pipeline resident
in VMEM — logits -> softmax -> AV fuse into a single program over a (N, h)
grid.

Scope: the no-mask path only — the HCM policy calls Visual_Ling_Attn with no
attention mask (seq2seq_highlevel_cma.py:200-201); masked calls fall back to
the XLA implementation (ops/cm_attention.mha_attention).

Backward: custom VJP that replays the XLA implementation and differentiates
it (rematerialization), exactly like ops/pallas_lstm.py — no hand-written
gradient to get wrong.

Gating: models/transformer.MultiHeadAttention routes through
:func:`attention_core` in ops/cm_attention, which uses this kernel when
``set_use_pallas(True)`` has been called (wired from config
TPU.PALLAS_ATTENTION by the trainers), the backend is TPU, there is no mask,
and shapes are tile-aligned (:func:`pallas_attention_ok`).

MEASURED (v5e single chip, benchmarks/attn_micro.py, 2026-08-16): at the HCM
shapes N=200, L=200, S=16, h=4, D=256 bf16 this kernel runs in ~960us vs
~149us for the XLA path — the op is too small for a per-(example, head) grid
to amortize program overhead, and XLA's batched dot_general already keeps the
intermediates in registers/VMEM at these sizes.  TPU.PALLAS_ATTENTION
therefore defaults to False; the kernel remains as a parity-tested,
explicitly-gated capability (the profitable pallas target in this workload is
the LSTM sequence kernel, ops/pallas_lstm.py, which stays on by default).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8  # fp32 sublane width


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale):
    q = q_ref[0, 0]  # (Lq, dk)
    k = k_ref[0, 0]  # (S, dk)
    v = v_ref[0, 0]  # (S, dv)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Lq, S)
    att = jax.nn.softmax(logits, axis=-1)
    out_ref[0, 0] = jnp.dot(
        att.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _pallas_attention(q, k, v, num_heads, interpret=False):
    """q (B, Lq, h*dk), k (B, S, h*dk), v (B, S, h*dv) -> (B, Lq, h*dv)."""
    B, Lq, D = q.shape
    S = k.shape[1]
    h = num_heads
    dk, dv = D // h, v.shape[-1] // h
    # fp32 in-kernel: the fp32 sublane width (8) admits L=200; bf16's (16)
    # does not, and the matmuls here are tiny so the cast cost is noise
    out_dtype = q.dtype
    qh = q.astype(jnp.float32).reshape(B, Lq, h, dk).transpose(0, 2, 1, 3)
    kh = k.astype(jnp.float32).reshape(B, S, h, dk).transpose(0, 2, 1, 3)
    vh = v.astype(jnp.float32).reshape(B, S, h, dv).transpose(0, 2, 1, 3)

    spec = lambda l, d: pl.BlockSpec(  # noqa: E731
        (1, 1, l, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / float(dk) ** 0.5),
        grid=(B, h),
        in_specs=[spec(Lq, dk), spec(S, dk), spec(S, dv)],
        out_specs=spec(Lq, dv),
        out_shape=jax.ShapeDtypeStruct((B, h, Lq, dv), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * h * Lq * S * (dk + dv),
            bytes_accessed=4 * B * h * (Lq * dk + S * (dk + dv) + Lq * dv),
            transcendentals=B * h * Lq * S,
        ),
    )(qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, h * dv).astype(out_dtype)


def pallas_attention_ok(Lq: int, S: int, num_heads: int, dq: int, dv: int) -> bool:
    """Tile-alignment gate: sublane-dim (Lq, S) multiples of 8, head dims
    divide evenly, and one (example, head) pipeline fits VMEM comfortably."""
    if Lq % _SUBLANE or S % _SUBLANE:
        return False
    if dq % num_heads or dv % num_heads:
        return False
    dk, dvh = dq // num_heads, dv // num_heads
    bytes_needed = 4 * (Lq * dk + S * (dk + dvh) + Lq * S + Lq * dvh)
    return bytes_needed < 8 * 1024 * 1024


def _xla_impl(q, k, v, num_heads):
    from robo_vln_tpu.ops.cm_attention import mha_attention

    return mha_attention(q, k, v, num_heads, attention_mask=None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_cross_modal_attention(q, k, v, num_heads):
    """No-mask MHA core: pallas forward on TPU, XLA-replay backward."""
    out, _ = _fused_fwd(q, k, v, num_heads)
    return out


def _fused_fwd(q, k, v, num_heads):
    use_pallas = (
        jax.default_backend() == "tpu"
        and pallas_attention_ok(
            q.shape[1], k.shape[1], num_heads, q.shape[-1], v.shape[-1]
        )
        and not os.environ.get("ROBO_VLN_DISABLE_PALLAS")
    )
    if use_pallas:
        out = _pallas_attention(q, k, v, num_heads)
    else:
        out = _xla_impl(q, k, v, num_heads)
    return out, (q, k, v)


def _fused_bwd(num_heads, residuals, g):
    # rematerialize: replay the XLA implementation and differentiate it
    _, vjp = jax.vjp(lambda q, k, v: _xla_impl(q, k, v, num_heads), *residuals)
    return vjp(g)


def _fwd_rule(q, k, v, num_heads):
    return _fused_fwd(q, k, v, num_heads)


fused_cross_modal_attention.defvjp(_fwd_rule, _fused_bwd)
