"""Instruction encoders: GloVe/learned-embedding RNN, and BERT-embedding RNN.

* :class:`InstructionEncoder` == reference instruction_encoder.py:9-92 —
  embedding (pretrained GloVe table or learned, padding_idx=0) -> (bi)LSTM/GRU
  over packed sequences; `final_state_only` returns the last hidden state,
  otherwise the full padded output sequence as (B, C, L) channel-major (the
  layout CMA's text_k 1x1-conv consumes, cma.py:272).
* :class:`LanguageEncoder` == reference language_encoder.py:11-137 — BERT (or
  GloVe) embedding -> multi-layer (bi)LSTM with a tanh encoder2decoder
  projection; used when INSTRUCTION_ENCODER.is_bert.

Packed-sequence semantics are reproduced by length-masked scans (ops/rnn.py).
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from robo_vln_tpu.ops.rnn import length_masked_gru, length_masked_lstm


def load_glove_embeddings(path: str) -> Optional[np.ndarray]:
    """GloVe table from embeddings.json.gz (instruction_encoder.py:55-68)."""
    if not path or not os.path.exists(path):
        return None
    with gzip.open(path, "rt") as f:
        return np.asarray(json.load(f), np.float32)


class _RNNDirection(nn.Module):
    hidden_size: int
    rnn_type: str
    reverse: bool = False

    @nn.compact
    def __call__(self, x, lengths):
        n_gates = 4 if self.rnn_type == "LSTM" else 3
        D = x.shape[-1]
        w_ih = self.param(
            "w_ih", nn.initializers.lecun_normal(), (D, n_gates * self.hidden_size)
        )
        w_hh = self.param(
            "w_hh", nn.initializers.orthogonal(), (self.hidden_size, n_gates * self.hidden_size)
        )
        b_ih = self.param("b_ih", nn.initializers.zeros, (n_gates * self.hidden_size,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (n_gates * self.hidden_size,))
        if self.rnn_type == "LSTM":
            outs, (hT, cT) = length_masked_lstm(
                x, lengths, w_ih, w_hh, b_ih + b_hh, reverse=self.reverse
            )
            return outs, (hT, cT)
        outs, hT = length_masked_gru(
            x, lengths, w_ih, w_hh, b_ih, b_hh, reverse=self.reverse
        )
        return outs, (hT, None)


class InstructionEncoder(nn.Module):
    vocab_size: int = 2504
    embedding_size: int = 50
    hidden_size: int = 256
    rnn_type: str = "LSTM"
    final_state_only: bool = True
    bidirectional: bool = False
    use_pretrained_embeddings: bool = True
    embedding_file: str = ""
    fine_tune_embeddings: bool = False

    @property
    def output_size(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)

    def _embedding_init(self, key, shape, dtype=jnp.float32):
        table = load_glove_embeddings(self.embedding_file) if self.use_pretrained_embeddings else None
        if table is not None:
            return jnp.asarray(table, dtype)
        return nn.initializers.normal(1.0)(key, shape, dtype)

    @nn.compact
    def __call__(self, instruction: jnp.ndarray):
        """instruction: (B, L) int token ids, 0 = pad."""
        instruction = instruction.astype(jnp.int32)
        lengths = jnp.sum(instruction != 0, axis=1)
        emb_shape = (self.vocab_size, self.embedding_size)
        table = self.param("embedding", self._embedding_init, emb_shape)
        embedded = jnp.take(table, instruction, axis=0)

        outs_f, (h_f, _) = _RNNDirection(self.hidden_size, self.rnn_type, name="fwd")(
            embedded, lengths
        )
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
            return final  # (B, H*dirs)
        return jnp.swapaxes(outs, 1, 2)  # (B, C, L) — channel-major, cma.py:92
