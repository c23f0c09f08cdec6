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


def test_rcm_wired_into_cma(rng):
    """MODEL.CMA.rcm_state_encoder=True swaps the 1st RNN for the recurrent
    cross-modal RCM encoder (reference cma.py:76-82,243-252) — the flag must
    change behavior, not be silently ignored (VERDICT.md weak#5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.test_policies import tiny_model_config, tiny_obs
    from robo_vln_tpu.models.cma import CMAPolicy

    mc = tiny_model_config()
    mc.DEPTH_ENCODER.output_size = 8
    mc.RGB_ENCODER.output_size = 16
    mc.STATE_ENCODER.hidden_size = 32
    mc.CMA.rcm_state_encoder = True
    mc.CMA.use_prev_action = True
    policy = CMAPolicy(model_config=mc)

    obs = tiny_obs(rng, t=3, b=2)
    masks = jnp.ones((2, 3)).at[:, 0].set(0.0)
    prev = jnp.zeros((2, 3, 2))
    variables = jax.jit(policy.init)(
        jax.random.PRNGKey(0), obs, policy.initial_hidden(2), prev, masks
    )
    # RCM param structure present (q_net + gru weights), rgb_linear absent
    assert "q_net_kernel" in variables["params"]["state_encoder"]
    assert "rgb_linear" not in variables["params"]

    actions, stop, hidden, _ = policy.apply(
        variables, obs, policy.initial_hidden(2), prev, masks
    )
    assert actions.shape == (2, 3, 2)
    assert hidden.shape == (4, 2, 32)
    assert np.isfinite(np.asarray(actions)).all()


def test_image_encoder_blocks(rng):
    """The last two transformer blocks of the reference inventory
    (transformer.py:305-343)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robo_vln_tpu.models.transformer import (
        ImageEncoderWithPosEncodings,
        ImagePlainEncoder,
        PositionEmbedding2DLearned,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 32)), jnp.float32)
    enc_out = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)

    pe_mod = PositionEmbedding2DLearned(num_pos_feats=16, max_size=8)
    pe, pe_vars = pe_mod.init_with_output(jax.random.PRNGKey(0), (4, 4), 2)
    pe = pe.reshape(2, 16, 32)

    m = ImageEncoderWithPosEncodings(d_model=32, h=2, d_ff=64, n_layers=1, d_in=32)
    out, _ = m.init_with_output(
        jax.random.PRNGKey(1), x, enc_out, pos_embed=pe
    )
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()

    p = ImagePlainEncoder(d_model=32, h=2, d_ff=64, n_layers=2, d_in=32)
    out2, _ = p.init_with_output(jax.random.PRNGKey(2), x)
    assert out2.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out2)).all()
