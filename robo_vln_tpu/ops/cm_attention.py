"""Multi-head attention core with the reference's masking convention.

Reference: ScaledDotProductAttention (transformer/transformer.py:81-109) —
logits / sqrt(d_k), mask-fill -inf before the softmax and hard-zero after (so
fully-masked rows produce zeros, not NaNs), then the value contraction.

Two implementations behind :func:`attention_core` (what the transformer
blocks call):

* :func:`mha_attention` — pure XLA; the default, the masked path, and the
  CPU fallback.
* ``fused_cross_modal_attention`` (ops/pallas_attention.py) — a pallas kernel
  fusing QK^T -> softmax -> AV in VMEM, used on TPU for unmasked tile-aligned
  calls when :func:`set_use_pallas` has enabled it (trainers wire it from
  config TPU.PALLAS_ATTENTION, default False — see the measurement in
  ops/pallas_attention.py; TPU.USE_PALLAS gates the LSTM kernel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# process-global gates, set from config by the trainers / evaluators (flax
# module attrs would force replumbing every policy builder for what are pure
# execution choices)
_USE_PALLAS = False
_SOW_ATTENTION = False


def set_use_pallas(enabled: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(enabled)


def use_pallas() -> bool:
    return _USE_PALLAS


def set_sow_attention(enabled: bool) -> None:
    """PLOT_ATTENTION support: make MultiHeadAttention sow its softmax weights
    into the "intermediates" collection (read by the eval attention plots)."""
    global _SOW_ATTENTION
    _SOW_ATTENTION = bool(enabled)


def sow_attention() -> bool:
    return _SOW_ATTENTION


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    attention_mask: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
):
    """Dispatch: fused pallas kernel (TPU, unmasked, aligned, enabled) or XLA.
    return_weights forces the XLA path (the kernel keeps weights in VMEM)."""
    if _USE_PALLAS and attention_mask is None and not return_weights:
        from robo_vln_tpu.ops.pallas_attention import fused_cross_modal_attention

        return fused_cross_modal_attention(q, k, v, num_heads)
    return mha_attention(
        q, k, v, num_heads, attention_mask, return_weights=return_weights
    )


def mha_attention(
    q: jnp.ndarray,  # (B, Lq, h*dk)
    k: jnp.ndarray,  # (B, Lk, h*dk)
    v: jnp.ndarray,  # (B, Lk, h*dv)
    num_heads: int,
    attention_mask: Optional[jnp.ndarray] = None,  # bool, True = masked;
    # broadcastable to (B, h, Lq, Lk)
    return_weights: bool = False,
):
    """Returns (B, Lq, h*dv), or (out, weights (B, h, Lq, Lk)) when
    return_weights. Softmax in float32."""
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    dk = q.shape[-1] // num_heads
    dv = v.shape[-1] // num_heads

    qh = q.reshape(B, Lq, num_heads, dk).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Lk, num_heads, dk).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lk, num_heads, dv).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dk, jnp.float32))
    if attention_mask is not None:
        logits = jnp.where(attention_mask, _NEG_INF, logits)
    att = jax.nn.softmax(logits, axis=-1)
    if attention_mask is not None:
        att = jnp.where(attention_mask, 0.0, att)
    out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(vh.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, num_heads * dv)
    if return_weights:
        return out, att
    return out


def single_query_attention(
    q: jnp.ndarray,  # (N, C)
    k: jnp.ndarray,  # (N, C, S)
    v: jnp.ndarray,  # (N, Cv, S)
    scale: float,
    mask: Optional[jnp.ndarray] = None,  # (N, S) bool, True = masked
) -> jnp.ndarray:
    """The CMA `_attn` op (reference cma.py:201-209): one query per example
    attending over S spatial/text slots; mask subtracts 1e8 *before* the
    scale multiply, exactly like the reference.  Returns (N, Cv)."""
    logits = jnp.einsum("nc,ncs->ns", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits - mask.astype(jnp.float32) * 1e8
    att = jax.nn.softmax(logits * scale, axis=1)
    return jnp.einsum("ns,ncs->nc", att.astype(v.dtype), v)
