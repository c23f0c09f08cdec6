"""RCM-style recurrent cross-modal state encoder (flax).

Equivalent of reference RCMStateEncoder
(/root/reference/robo_vln_baselines/models/encoders/rcm_state_encoder.py:16-114,
after arXiv 1811.10092): at each timestep the previous RNN output attends over
rgb/depth K/V, and the attended features (+ prev action embedding) feed a GRU.

Unlike the CMA path this attention is genuinely recurrent, so it lives inside
the lax.scan; the K/V 1x1-conv projections for all timesteps are still hoisted
out as one batched matmul.  Hidden packing: (rnn_layers + 1, B, H) where the
last slot carries the previous output (rcm_state_encoder.py:73,112).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class RCMStateEncoder(nn.Module):
    hidden_size: int
    rnn_type: str = "GRU"

    @property
    def num_recurrent_layers(self):
        return (2 if self.rnn_type == "LSTM" else 1) + 1

    def initial_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((self.num_recurrent_layers, batch_size, self.hidden_size))

    @nn.compact
    def __call__(
        self,
        rgb_tokens: jnp.ndarray,  # (T, B, S_r, C_r)
        depth_tokens: jnp.ndarray,  # (T, B, S_d, C_d)
        prev_actions: jnp.ndarray,  # (T, B, A)
        hidden: jnp.ndarray,  # (layers+1, B, H)
        masks: jnp.ndarray,  # (T, B)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H = self.hidden_size
        rgb_kv = nn.Dense(H, name="rgb_kv")(rgb_tokens)
        depth_kv = nn.Dense(H, name="depth_kv")(depth_tokens)
        # q_net params created eagerly (a flax submodule materializing params
        # inside the scan body would leak tracers)
        q_w = self.param("q_net_kernel", nn.initializers.orthogonal(), (H, H // 2))
        q_b = self.param("q_net_bias", nn.initializers.zeros, (H // 2,))
        q_net = lambda x: x @ q_w + q_b
        scale = 1.0 / jnp.sqrt(jnp.asarray(H // 2, jnp.float32))

        a_dim = prev_actions.shape[-1]
        n_gates = 4 if self.rnn_type == "LSTM" else 3
        w_ih = self.param(
            "w_ih", nn.initializers.orthogonal(), (H + a_dim, n_gates * H)
        )
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (H, n_gates * H))
        b_ih = self.param("b_ih", nn.initializers.zeros, (n_gates * H,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (n_gates * H,))

        def attend(q, kv):
            k, v = kv[..., : H // 2], kv[..., H // 2 :]
            logits = jnp.einsum("bc,bsc->bs", q, k, preferred_element_type=jnp.float32)
            att = jax.nn.softmax(logits * scale, axis=1)
            return jnp.einsum("bs,bsc->bc", att.astype(v.dtype), v)

        def gru_cell(x, h):
            gx = x @ w_ih + b_ih
            gh = h @ w_hh + b_hh
            xr, xz, xn = jnp.split(gx, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            nw = jnp.tanh(xn + r * hn)
            return (1.0 - z) * nw + z * h

        def lstm_cell(x, h, c):
            g = x @ w_ih + b_ih + h @ w_hh + b_hh
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            return jax.nn.sigmoid(o) * jnp.tanh(c), c

        def step(carry, inp):
            rnn_h, last_out = carry
            rgb, depth, pa, m = inp
            m = m[:, None]
            last_out = last_out * m
            q = q_net(last_out)
            rgb_attn = attend(q, rgb)
            depth_attn = attend(q, depth)
            x = jnp.concatenate([rgb_attn, depth_attn, pa], axis=1)
            if self.rnn_type == "LSTM":
                h, c = rnn_h[0] * m, rnn_h[1] * m
                out, c = lstm_cell(x, h, c)
                rnn_h = jnp.stack([out, c])
            else:
                h = rnn_h[0] * m
                out = gru_cell(x, h)
                rnn_h = out[None]
            return (rnn_h, out), out

        rnn_h0 = hidden[:-1]
        last0 = hidden[-1]
        (rnn_hT, lastT), outs = jax.lax.scan(
            step, (rnn_h0, last0), (rgb_kv, depth_kv, prev_actions, masks)
        )
        new_hidden = jnp.concatenate([rnn_hT, lastT[None]], axis=0)
        return outs, new_hidden
