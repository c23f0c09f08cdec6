"""LanguageEncoder: BERT (or GloVe) embedding -> multi-layer (bi)LSTM.

Equivalent of reference language_encoder.py:11-137, the instruction encoder
Seq2SeqNet selects when INSTRUCTION_ENCODER.is_bert (seq2seq.py:45-48):
frozen BERT embedding (no-grad) -> packed (bi)LSTM; `final_state_only`
returns h_T, otherwise the padded output sequence plus a tanh
`encoder2decoder` projection of the last layer's hidden.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.models.encoders.bert import BertEncoder
from robo_vln_tpu.models.encoders.instruction import _RNNDirection


class LanguageEncoder(nn.Module):
    bert_config: Any  # MODEL.BERT tree
    embedding_size: int = 768
    hidden_size: int = 256
    rnn_type: str = "LSTM"
    final_state_only: bool = True
    bidirectional: bool = False
    dropout_ratio: float = 0.25  # reference language_encoder.py:33-34
    compute_dtype: Any = jnp.float32

    @property
    def output_size(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)

    @nn.compact
    def __call__(self, instruction: jnp.ndarray, deterministic: bool = True):
        bc = self.bert_config
        embedded = BertEncoder(
            vocab_size=bc.vocab_size,
            hidden_size=bc.hidden_size,
            num_layers=bc.num_layers,
            num_heads=bc.num_heads,
            intermediate_size=bc.intermediate_size,
            max_position_embeddings=bc.max_position_embeddings,
            compute_dtype=self.compute_dtype,
            name="embedding_layer",
        )(instruction)
        if not getattr(bc, "trainable", False):
            # frozen no-grad embedding (reference language_encoder.py:42);
            # MODEL.BERT.trainable=True is the PARITY.md deviation
            embedded = jax.lax.stop_gradient(embedded)
        # embedding dropout, active in training (language_encoder.py:119)
        embedded = nn.Dropout(self.dropout_ratio)(
            embedded, deterministic=deterministic
        )
        lengths = jnp.sum(instruction != 0, axis=1)

        outs_f, (h_f, c_f) = _RNNDirection(
            self.hidden_size, self.rnn_type, name="fwd"
        )(embedded, lengths)
        if self.bidirectional:
            outs_b, (h_b, _) = _RNNDirection(
                self.hidden_size, self.rnn_type, reverse=True, name="bwd"
            )(embedded, lengths)
            outs = jnp.concatenate([outs_f, outs_b], axis=-1)
            final = jnp.concatenate([h_f, h_b], axis=-1)
        else:
            outs = outs_f
            final = h_f

        if self.final_state_only:
            return final
        # full-sequence mode: (output, (tanh(W h_T), c_T))
        h_t = jnp.tanh(
            nn.Dense(self.output_size, name="encoder2decoder")(final)
        )
        return outs, (h_t, c_f)
