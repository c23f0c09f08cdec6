"""BERT-base encoder (flax), the frozen instruction embedder of the HCM agent.

Replaces the reference's HuggingFace ``BertModel.from_pretrained`` call
(seq2seq_highlevel_cma.py:45,192-196; language_encoder.py:42).  Architecture is
standard BERT: sum of word/position/token-type embeddings + LayerNorm(1e-12),
then post-LN transformer layers with erf-GELU.  Two reference quirks kept:

* the model is called with input_ids only — no attention mask — so pad tokens
  are attended (HF defaults the mask to all-ones when None);
* it runs frozen under no_grad; callers wrap the output in stop_gradient.

Weights port from a HF torch state_dict via utils/weight_port.py; with no
checkpoint on disk the model random-initializes (documented in README —
pretrained parity needs the user to drop bert_base_uncased.npz in data/).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.ops.cm_attention import mha_attention


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        q = nn.Dense(self.hidden_size, dtype=dt, name="query")(x)
        k = nn.Dense(self.hidden_size, dtype=dt, name="key")(x)
        v = nn.Dense(self.hidden_size, dtype=dt, name="value")(x)
        att = mha_attention(q, k, v, self.num_heads)
        att = nn.Dense(self.hidden_size, dtype=dt, name="attention_output")(att)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="attention_ln")(
            x.astype(jnp.float32) + att.astype(jnp.float32)
        )
        y = nn.Dense(self.intermediate_size, dtype=dt, name="intermediate")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_size, dtype=dt, name="output")(y)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="output_ln")(
            x.astype(jnp.float32) + y.astype(jnp.float32)
        )
        return x


class BertEncoder(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids (B, L) -> last hidden state (B, L, hidden)."""
        input_ids = input_ids.astype(jnp.int32)
        B, L = input_ids.shape
        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (self.vocab_size, self.hidden_size),
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_position_embeddings, self.hidden_size),
        )
        typ = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (self.type_vocab_size, self.hidden_size),
        )
        x = jnp.take(word, input_ids, axis=0) + pos[None, :L] + typ[0][None, None]
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_ln")(x)
        for i in range(self.num_layers):
            x = BertLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.compute_dtype, name=f"layer_{i}",
            )(x)
        return x
