"""Multi-head attention core with the reference's masking convention.

Reference: ScaledDotProductAttention (transformer/transformer.py:81-109) —
logits / sqrt(d_k), mask-fill -inf before the softmax and hard-zero after (so
fully-masked rows produce zeros, not NaNs), then the value contraction.

Two implementations:

* :func:`mha_attention` — pure XLA.  At robo-vln sizes (L<=200 queries, S=16
  visual keys) XLA fuses this into a couple of MXU ops; it is the default and
  the fallback on CPU.
* :func:`fused_cross_modal_attention` (ops/pallas_attention.py) — a pallas
  kernel fusing QK^T -> softmax -> AV in VMEM for the TPU hot path, used by
  the HCM policy when TPU.USE_PALLAS is set and shapes are tile-aligned.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def mha_attention(
    q: jnp.ndarray,  # (B, Lq, h*dk)
    k: jnp.ndarray,  # (B, Lk, h*dk)
    v: jnp.ndarray,  # (B, Lk, h*dv)
    num_heads: int,
    attention_mask: Optional[jnp.ndarray] = None,  # bool, True = masked;
    # broadcastable to (B, h, Lq, Lk)
) -> jnp.ndarray:
    """Returns (B, Lq, h*dv). Softmax in float32."""
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
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, num_heads * dv)


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
