"""Cross-modal transformer blocks (flax).

Functional equivalents of the reference transformer stack
(/root/reference/robo_vln_baselines/models/transformer/transformer.py):

* ``ScaledDotProductAttention`` / ``MultiHeadAttention`` (transformer.py:46-126)
  — explicit Q/K/V/O linears, mask-fill -inf before softmax then zero after,
  post-LN residual;
* ``PositionWiseFeedForward`` (transformer.py:25-43) — ReLU MLP, post-LN
  residual;
* ``InterModuleAttnLayer`` (transformer.py:209-221) — cross-attention + FFN,
  no self-attention;
* ``VisualLingAttn`` (transformer.py:251-281) — the HCM hot block:
  instruction-query × visual-key/value cross attention with sinusoid PE on the
  queries.

All matmuls run in the configured compute dtype (bfloat16 by default) with
float32 accumulation; the softmax is kept in float32.  The attention core
dispatches through ops/cm_attention.attention_core: the fused pallas kernel
(ops/pallas_attention.py — QK^T -> softmax -> AV resident in VMEM) on TPU for
unmasked tile-aligned calls when TPU.USE_PALLAS is set, plain XLA otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.ops import cm_attention
from robo_vln_tpu.ops.cm_attention import attention_core


def sinusoid_encoding_table(max_len: int, d_model: int) -> jnp.ndarray:
    """Sin/cos table matching reference common/utils.py:167-185: both the sin
    (even cols) and cos (odd cols) of pair k use frequency 10000^(2k/d)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]  # (L, 1)
    dim = jnp.arange(d_model // 2, dtype=jnp.float32)[None, :]  # (1, D/2)
    angle = pos / jnp.power(10000.0, 2.0 * dim / d_model)
    out = jnp.zeros((max_len, d_model), jnp.float32)
    out = out.at[:, 0::2].set(jnp.sin(angle))
    out = out.at[:, 1::2].set(jnp.cos(angle))
    return out


class MultiHeadAttention(nn.Module):
    """Post-LN residual MHA (reference transformer.py:46-126)."""

    d_model: int
    h: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, values, attention_mask=None, deterministic=True):
        d_k = self.d_model // self.h
        q = nn.Dense(self.h * d_k, name="fc_q", dtype=self.compute_dtype)(queries)
        k = nn.Dense(self.h * d_k, name="fc_k", dtype=self.compute_dtype)(keys)
        v = nn.Dense(self.h * d_k, name="fc_v", dtype=self.compute_dtype)(values)
        if cm_attention.sow_attention():
            out, weights = attention_core(
                q, k, v, self.h, attention_mask, return_weights=True
            )
            self.sow("intermediates", "attn", weights)
        else:
            out = attention_core(q, k, v, self.h, attention_mask)
        out = nn.Dense(self.d_model, name="fc_o", dtype=self.compute_dtype)(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            queries.astype(jnp.float32) + out.astype(jnp.float32)
        )
        return out


class PositionWiseFeedForward(nn.Module):
    """ReLU MLP with post-LN residual (reference transformer.py:25-43)."""

    d_model: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Dense(self.d_ff, name="fc1", dtype=self.compute_dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, name="fc2", dtype=self.compute_dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            x.astype(jnp.float32) + y.astype(jnp.float32)
        )


class EncoderLayer(nn.Module):
    """Self-attention + FFN (reference transformer.py:130-139)."""

    d_model: int
    h: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, values, attention_mask=None, deterministic=True):
        att = MultiHeadAttention(
            self.d_model, self.h, self.dropout, self.compute_dtype, name="mhatt"
        )(queries, keys, values, attention_mask, deterministic)
        return PositionWiseFeedForward(
            self.d_model, self.d_ff, self.dropout, self.compute_dtype, name="pwff"
        )(att, deterministic)


class InterModuleAttnLayer(nn.Module):
    """Cross-attention + FFN, no self-attention (transformer.py:209-221)."""

    d_model: int
    h: int
    d_ff: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_1, input_2, enc_att_mask=None, deterministic=True):
        att = MultiHeadAttention(
            self.d_model, self.h, self.dropout, self.compute_dtype, name="enc_att"
        )(input_1, input_2, input_2, enc_att_mask, deterministic)
        return PositionWiseFeedForward(
            self.d_model, self.d_ff, self.dropout, self.compute_dtype, name="pwff"
        )(att, deterministic)


class VisualLingAttn(nn.Module):
    """Instruction-query x visual-KV cross-modal attention — the core HCM op
    (reference Visual_Ling_Attn, transformer.py:251-281).

    input:   instruction embedding (B, L, ins_in_features)  [BERT 768]
    input_2: visual tokens (B, S, vis_in_features)           [16 spatial]
    """

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    vis_in_features: int
    ins_in_features: int
    dropout: float = 0.25
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, instruction, visual, enc_att_mask=None, deterministic=True):
        drop = nn.Dropout(self.dropout)
        ln = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")

        vis = nn.relu(nn.Dense(self.d_model, name="vis_fc", dtype=self.compute_dtype)(visual))
        vis = drop(vis, deterministic=deterministic)
        vis = ln(vis.astype(jnp.float32))

        ins = nn.relu(nn.Dense(self.d_model, name="ins_fc", dtype=self.compute_dtype)(instruction))
        ins = drop(ins, deterministic=deterministic)
        ins = ln(ins.astype(jnp.float32))

        pe = sinusoid_encoding_table(ins.shape[1], ins.shape[2])
        ins = ins + pe[None]

        out = vis
        for i in range(self.n_layers):
            out = InterModuleAttnLayer(
                self.d_model,
                self.h,
                self.d_ff,
                self.dropout,
                self.compute_dtype,
                name=f"layers_{i}",
            )(ins, out, enc_att_mask, deterministic)
        return out


class BaseEncoder(nn.Module):
    """Stack of self-attention EncoderLayers (transformer.py:141-157)."""

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True):
        out = x
        for i in range(self.n_layers):
            out = EncoderLayer(
                self.d_model,
                self.h,
                self.d_ff,
                self.dropout,
                self.compute_dtype,
                name=f"layers_{i}",
            )(out, out, out, attention_mask, deterministic)
        return out


class TransformerLanguageEncoder(nn.Module):
    """Linear->ReLU->LN input stage + sinusoid PE (masked at pads) + N
    self-attention layers (reference transformer.py:159-182)."""

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    d_in: int
    dropout: float = 0.2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, attention_mask=None, deterministic=True):
        out = nn.relu(nn.Dense(self.d_model, name="fc", dtype=self.compute_dtype)(x))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            out.astype(jnp.float32)
        )
        pe = sinusoid_encoding_table(out.shape[1], out.shape[2])[None]
        if pad_mask is not None:  # (B, L, 1) bool, True = pad
            pe = jnp.where(pad_mask, 0.0, pe)
        out = out + pe
        return BaseEncoder(
            self.d_model, self.h, self.d_ff, self.n_layers, self.dropout,
            self.compute_dtype, name="encoder",
        )(out, attention_mask, deterministic)


class DecoderLayer(nn.Module):
    """Self-attention + cross-attention + FFN with optional positional embeds
    and adaptive pooling (reference transformer.py:184-207)."""

    d_model: int
    h: int
    d_ff: int
    dropout: float = 0.1
    pool_to: int = 0  # reference `pooler`: AdaptiveAvgPool1d(100)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_output, mask_self_att=None, mask_enc_att=None,
                 pos_embed=None, deterministic=True):
        if pos_embed is not None:
            x = x + pos_embed
        self_att = MultiHeadAttention(
            self.d_model, self.h, self.dropout, self.compute_dtype,
            name="self_att",
        )(x, x, x, mask_self_att, deterministic)
        if pos_embed is not None:
            self_att = self_att + pos_embed
        if self.pool_to:
            # AdaptiveAvgPool1d over the token axis
            from robo_vln_tpu.models.encoders.resnet import adaptive_avg_pool2d

            pooled = adaptive_avg_pool2d(self_att[:, :, None, :], (self.pool_to, 1))
            self_att = pooled[:, :, 0, :]
        enc_att = MultiHeadAttention(
            self.d_model, self.h, self.dropout, self.compute_dtype,
            name="enc_att",
        )(self_att, enc_output, enc_output, mask_enc_att, deterministic)
        return PositionWiseFeedForward(
            self.d_model, self.d_ff, self.dropout, self.compute_dtype,
            name="pwff",
        )(enc_att, deterministic)


class InterModuleAttnDecoder(nn.Module):
    """Shared Linear->ReLU->LN input projection on both streams + N
    cross-attention layers (reference transformer.py:224-248)."""

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    in_features: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_1, input_2, self_att_mask=None, enc_att_mask=None,
                 deterministic=True):
        fc = nn.Dense(self.d_model, name="fc", dtype=self.compute_dtype)
        drop = nn.Dropout(self.dropout)
        ln = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")
        out = ln(drop(nn.relu(fc(input_1)), deterministic=deterministic)
                 .astype(jnp.float32))
        inp2 = ln(drop(nn.relu(fc(input_2)), deterministic=deterministic)
                  .astype(jnp.float32))
        for i in range(self.n_layers):
            out = InterModuleAttnLayer(
                self.d_model, self.h, self.d_ff, self.dropout,
                self.compute_dtype, name=f"layers_{i}",
            )(out, inp2, enc_att_mask, deterministic)
        return out


class ImageCrossModalEncoder(nn.Module):
    """Linear->ReLU->LN input stage + N DecoderLayers over encoder output
    (reference transformer.py:283-303)."""

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    in_features: int
    dropout: float = 0.2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_output, self_att_mask=None, enc_att_mask=None,
                 deterministic=True):
        out = nn.relu(nn.Dense(self.d_model, name="fc", dtype=self.compute_dtype)(x))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            out.astype(jnp.float32)
        )
        for i in range(self.n_layers):
            out = DecoderLayer(
                self.d_model, self.h, self.d_ff, self.dropout,
                compute_dtype=self.compute_dtype, name=f"layers_{i}",
            )(out, enc_output, self_att_mask, enc_att_mask,
              deterministic=deterministic)
        return out


class PositionEmbedding2DLearned(nn.Module):
    """Learned 2D absolute positional embedding over an HxW feature map
    (reference transformer.py:344-370). Returns (B, H, W, 2*num_pos_feats)."""

    num_pos_feats: int = 128
    max_size: int = 50

    @nn.compact
    def __call__(self, feature_map_hw, batch: int):
        h, w = feature_map_hw
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0),
            (self.max_size, self.num_pos_feats),
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0),
            (self.max_size, self.num_pos_feats),
        )
        x_emb = jnp.broadcast_to(col[None, :w], (h, w, self.num_pos_feats))
        y_emb = jnp.broadcast_to(row[:h, None], (h, w, self.num_pos_feats))
        pos = jnp.concatenate([x_emb, y_emb], axis=-1)
        return jnp.broadcast_to(pos[None], (batch, h, w, 2 * self.num_pos_feats))


class ImageEncoderWithPosEncodings(nn.Module):
    """Dropout -> LN input stage + N DecoderLayers with a positional embedding
    added to the queries (reference ImageEncoder_with_PosEncodings,
    transformer.py:305-326).  The reference also constructs an `fc` projection
    whose forward use is commented out (:316) — dead weight not reproduced."""

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    d_in: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_output, self_att_mask=None, enc_att_mask=None,
                 pos_embed=None, deterministic=True):
        out = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            out.astype(jnp.float32)
        )
        for i in range(self.n_layers):
            out = DecoderLayer(
                self.d_model, self.h, self.d_ff, self.dropout,
                compute_dtype=self.compute_dtype, name=f"layers_{i}",
            )(out, enc_output, self_att_mask, enc_att_mask, pos_embed,
              deterministic=deterministic)
        return out


class ImagePlainEncoder(nn.Module):
    """Linear->ReLU->Dropout->LN input stage + N self-attention layers
    (reference ImagePlainEncoder, transformer.py:328-342; its __init__ passes
    BaseEncoder the wrong arguments and is uninstantiable as shipped — this
    implements the intended semantics)."""

    d_model: int
    h: int
    d_ff: int
    n_layers: int
    d_in: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True):
        out = nn.relu(nn.Dense(self.d_model, name="fc", dtype=self.compute_dtype)(x))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            out.astype(jnp.float32)
        )
        return BaseEncoder(
            self.d_model, self.h, self.d_ff, self.n_layers, self.dropout,
            self.compute_dtype, name="encoder",
        )(out, attention_mask, deterministic)
