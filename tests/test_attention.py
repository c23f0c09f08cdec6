"""Attention-core golden tests vs torch reference math
(transformer/transformer.py:81-109 and cma.py:201-209)."""

import numpy as np
import torch

import jax.numpy as jnp

from robo_vln_tpu.ops.cm_attention import mha_attention, single_query_attention


def torch_sdpa(q, k, v, h, mask=None):
    """Reference ScaledDotProductAttention inner math (projections applied by
    the caller), transformer.py:91-108."""
    b_s, nq, _ = q.shape
    nk = k.shape[1]
    d_k = q.shape[-1] // h
    d_v = v.shape[-1] // h
    qh = q.view(b_s, nq, h, d_k).permute(0, 2, 1, 3)
    kh = k.view(b_s, nk, h, d_k).permute(0, 2, 3, 1)
    vh = v.view(b_s, nk, h, d_v).permute(0, 2, 1, 3)
    att = torch.matmul(qh, kh) / np.sqrt(d_k)
    if mask is not None:
        att = att.masked_fill(mask, -np.inf)
    att = torch.softmax(att, -1)
    if mask is not None:
        att = att.masked_fill(mask, 0)
    out = torch.matmul(att, vh).permute(0, 2, 1, 3).contiguous().view(b_s, nq, h * d_v)
    return out


def test_mha_unmasked(rng):
    B, Lq, Lk, h, dk = 2, 7, 16, 4, 8
    q = rng.standard_normal((B, Lq, h * dk)).astype(np.float32)
    k = rng.standard_normal((B, Lk, h * dk)).astype(np.float32)
    v = rng.standard_normal((B, Lk, h * dk)).astype(np.float32)
    ref = torch_sdpa(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), h)
    got = mha_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_mha_masked_including_full_rows(rng):
    B, Lq, Lk, h, dk = 2, 5, 9, 2, 4
    q = rng.standard_normal((B, Lq, h * dk)).astype(np.float32)
    k = rng.standard_normal((B, Lk, h * dk)).astype(np.float32)
    v = rng.standard_normal((B, Lk, h * dk)).astype(np.float32)
    mask = rng.random((B, 1, Lq, Lk)) > 0.6
    mask[0, 0, 2, :] = True  # fully-masked row -> zeros, not NaN
    ref = torch_sdpa(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), h,
        torch.from_numpy(mask),
    )
    got = mha_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h, jnp.asarray(mask)
    )
    assert not np.isnan(np.asarray(got)).any()
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_single_query_attention(rng):
    """CMA _attn (cma.py:201-209): einsum logits, -1e8 mask, scaled softmax."""
    N, C, S = 6, 16, 12
    q = rng.standard_normal((N, C)).astype(np.float32)
    k = rng.standard_normal((N, C, S)).astype(np.float32)
    v = rng.standard_normal((N, C, S)).astype(np.float32)
    mask = rng.random((N, S)) > 0.7
    scale = 1.0 / np.sqrt(C)

    logits = torch.einsum("nc,nci->ni", torch.from_numpy(q), torch.from_numpy(k))
    logits = logits - torch.from_numpy(mask).float() * 1e8
    att = torch.softmax(logits * scale, dim=1)
    ref = torch.einsum("ni,nci->nc", att, torch.from_numpy(v))

    got = single_query_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_sinusoid_table():
    """PE table matches reference sinusoid_encoding_table (utils.py:167-185)."""
    from robo_vln_tpu.models.transformer import sinusoid_encoding_table

    L, D = 50, 32
    inp = torch.arange(L, dtype=torch.float32).view(-1, 1)
    dim = torch.arange(D // 2, dtype=torch.float32).view(1, -1)
    sin = torch.sin(inp / 10000 ** (2 * dim / D))
    cos = torch.cos(inp / 10000 ** (2 * dim / D))
    ref = torch.zeros((L, D))
    ref[:, 0::2] = sin
    ref[:, 1::2] = cos

    got = sinusoid_encoding_table(L, D)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)
