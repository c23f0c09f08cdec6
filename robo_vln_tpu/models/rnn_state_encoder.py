"""Recurrent state encoder (flax) with packed-hidden API.

Equivalent of the reference RNNStateEncoder
(/root/reference/robo_vln_baselines/models/decoder/state_encoder.py:5-139):

* hidden state is "packed" as a single (num_recurrent_layers, B, H) array —
  for LSTM that is [h; c] stacked on the layer axis (state_encoder.py:47-62) —
  so trainers/eval loops slice hidden exactly like the reference does;
* sequence forward resets the hidden wherever the done-mask is 0 and applies
  ``stop_gradient`` to the returned carry (the reference detaches at
  state_encoder.py:131, which is what makes TBPTT chunking work);
* the compute is a fused lax.scan (ops/rnn.py) — one big input matmul plus a
  small recurrent matmul per step — instead of the reference's Python
  mask-split loop.

Sequence inputs here are time-major (T, B, D); the policy wrappers handle the
(T*B, D) flat layout the reference trainers use.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.ops import rnn as rnn_ops


def orthogonal_rnn_init(key, shape, dtype=jnp.float32):
    """Orthogonal weights / zero bias like reference layer_init
    (state_encoder.py:34-39)."""
    return nn.initializers.orthogonal()(key, shape, dtype)


class RNNStateEncoder(nn.Module):
    hidden_size: int
    rnn_type: str = "LSTM"  # or "GRU"
    num_layers: int = 1

    @property
    def num_recurrent_layers(self) -> int:
        return self.num_layers * (2 if self.rnn_type == "LSTM" else 1)

    def initial_hidden(self, batch_size: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros(
            (self.num_recurrent_layers, batch_size, self.hidden_size), dtype
        )

    def _params(self, input_size: int):
        n_gates = 4 if self.rnn_type == "LSTM" else 3
        w_ih = self.param(
            "w_ih", orthogonal_rnn_init, (input_size, n_gates * self.hidden_size)
        )
        w_hh = self.param(
            "w_hh", orthogonal_rnn_init, (self.hidden_size, n_gates * self.hidden_size)
        )
        b_ih = self.param(
            "b_ih", nn.initializers.zeros, (n_gates * self.hidden_size,)
        )
        b_hh = self.param(
            "b_hh", nn.initializers.zeros, (n_gates * self.hidden_size,)
        )
        return w_ih, w_hh, b_ih, b_hh

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, D) single step or (T, B, D) sequence
        hidden: jnp.ndarray,  # (num_recurrent_layers, B, H) packed
        masks: jnp.ndarray,  # (B,) or (T, B)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.num_layers != 1:
            raise NotImplementedError("reference uses num_layers=1 throughout")
        w_ih, w_hh, b_ih, b_hh = self._params(x.shape[-1])

        single = x.ndim == 2
        if single:
            x = x[None]
            masks = masks[None]

        if self.rnn_type == "LSTM":
            from robo_vln_tpu.ops.pallas_lstm import lstm_sequence_fused

            h0, c0 = hidden[0], hidden[1]
            # fused pallas recurrent core on TPU (W_hh resident in VMEM for
            # all T steps); transparently falls back to the lax.scan core
            outs, (hT, cT) = lstm_sequence_fused(
                x, h0, c0, masks, w_ih, w_hh, b_ih + b_hh
            )
            new_hidden = jnp.stack([hT, cT], axis=0)
        else:
            h0 = hidden[0]
            outs, hT = rnn_ops.gru_sequence(x, h0, masks, w_ih, w_hh, b_ih, b_hh)
            new_hidden = hT[None]

        if not single:
            # seq_forward detaches the carry (state_encoder.py:131)
            new_hidden = jax.lax.stop_gradient(new_hidden)
            return outs, new_hidden
        return outs[0], new_hidden
