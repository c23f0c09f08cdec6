"""Masked recurrent cores as fused XLA scans.

TPU-native replacement for the reference's RNNStateEncoder
(/root/reference/robo_vln_baselines/models/decoder/state_encoder.py:5-139),
which runs a Python loop that splits the sequence at done-mask zeros and calls
cuDNN per segment.  Here the whole sequence is one `lax.scan`:

* the input projection ``x @ W_ih + b`` for *all* timesteps is computed as a
  single large matmul before the scan (MXU-friendly — the recurrent scan only
  carries the small ``h @ W_hh`` matmul),
* the done-mask multiplies the carried hidden state at every step, which is
  numerically identical to the reference's segment splitting (masks are {0,1};
  multiplying by 1 at non-boundary steps is the identity),
* torch gate layouts are preserved (LSTM: i,f,g,o; GRU: r,z,n) so weights port
  1:1 from reference checkpoints.

Shapes are time-major inside the scan: x (T, B, D), masks (T, B).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def lstm_sequence(
    x: jnp.ndarray,  # (T, B, D)
    h0: jnp.ndarray,  # (B, H)
    c0: jnp.ndarray,  # (B, H)
    masks: jnp.ndarray,  # (T, B) — 0 resets hidden before consuming step t
    w_ih: jnp.ndarray,  # (D, 4H) gate order i,f,g,o (torch layout, transposed)
    w_hh: jnp.ndarray,  # (H, 4H)
    b: jnp.ndarray,  # (4H,) == b_ih + b_hh
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Masked LSTM over a full sequence. Returns (outputs (T,B,H), (hT,cT))."""
    H = h0.shape[-1]
    # One large matmul for every timestep's input projection.
    gates_x = jnp.einsum("tbd,dk->tbk", x, w_ih) + b  # (T, B, 4H)

    def step(carry, inp):
        h, c = carry
        gx, m = inp
        m = m[:, None]
        h = h * m
        c = c * m
        g = gx + h @ w_hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (hT, cT), outs = jax.lax.scan(step, (h0, c0), (gates_x, masks))
    return outs, (hT, cT)


def gru_sequence(
    x: jnp.ndarray,  # (T, B, D)
    h0: jnp.ndarray,  # (B, H)
    masks: jnp.ndarray,  # (T, B)
    w_ih: jnp.ndarray,  # (D, 3H) gate order r,z,n
    w_hh: jnp.ndarray,  # (H, 3H)
    b_ih: jnp.ndarray,  # (3H,)
    b_hh: jnp.ndarray,  # (3H,) — kept separate: n-gate needs r*(W_hn h + b_hn)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked GRU over a full sequence (torch semantics). Returns (outs, hT)."""
    H = h0.shape[-1]
    gates_x = jnp.einsum("tbd,dk->tbk", x, w_ih) + b_ih  # (T, B, 3H)

    def step(h, inp):
        gx, m = inp
        h = h * m[:, None]
        gh = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    hT, outs = jax.lax.scan(step, h0, (gates_x, masks))
    return outs, hT


def lstm_step(x, h, c, mask, w_ih, w_hh, b):
    """Single-step masked LSTM (eval path; reference single_forward,
    state_encoder.py:72-81). x (B, D), mask (B,)."""
    outs, (hT, cT) = lstm_sequence(
        x[None], h, c, mask[None], w_ih, w_hh, b
    )
    return outs[0], (hT, cT)


def gru_step(x, h, mask, w_ih, w_hh, b_ih, b_hh):
    outs, hT = gru_sequence(x[None], h, mask[None], w_ih, w_hh, b_ih, b_hh)
    return outs[0], hT


def length_masked_lstm(
    x: jnp.ndarray,  # (B, L, D) batch-major (instruction encoding path)
    lengths: jnp.ndarray,  # (B,) valid token counts
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b: jnp.ndarray,
    reverse: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """LSTM with packed-sequence semantics (reference InstructionEncoder uses
    torch pack_padded_sequence, instruction_encoder.py:83-92): the carry is
    frozen on pad steps so the final state equals the state at ``lengths-1``,
    and outputs at pad steps are zero.

    With ``reverse=True`` runs the backward direction of a biLSTM: processes
    t = L-1 .. 0, skipping (freezing through) trailing pads, so the "final"
    state is the state after consuming token 0.
    """
    B, L, D = x.shape
    H = w_hh.shape[0]
    t_idx = jnp.arange(L)
    valid = t_idx[None, :] < lengths[:, None]  # (B, L)

    xs = jnp.swapaxes(x, 0, 1)  # (T, B, D)
    vs = jnp.swapaxes(valid, 0, 1)  # (T, B)
    if reverse:
        xs = xs[::-1]
        vs = vs[::-1]

    gates_x = jnp.einsum("tbd,dk->tbk", xs, w_ih) + b

    def step(carry, inp):
        h, c = carry
        gx, v = inp
        g = gx + h @ w_hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        v = v[:, None]
        h_out = jnp.where(v, h_new, 0.0)
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        return (h, c), h_out

    h0 = jnp.zeros((B, H), x.dtype)
    c0 = jnp.zeros((B, H), x.dtype)
    (hT, cT), outs = jax.lax.scan(step, (h0, c0), (gates_x, vs))
    if reverse:
        outs = outs[::-1]
    return jnp.swapaxes(outs, 0, 1), (hT, cT)  # (B, L, H)


def length_masked_gru(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    reverse: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GRU with packed-sequence semantics (see length_masked_lstm)."""
    B, L, D = x.shape
    H = w_hh.shape[0]
    t_idx = jnp.arange(L)
    valid = t_idx[None, :] < lengths[:, None]

    xs = jnp.swapaxes(x, 0, 1)
    vs = jnp.swapaxes(valid, 0, 1)
    if reverse:
        xs = xs[::-1]
        vs = vs[::-1]

    gates_x = jnp.einsum("tbd,dk->tbk", xs, w_ih) + b_ih

    def step(h, inp):
        gx, v = inp
        gh = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        v = v[:, None]
        h_out = jnp.where(v, h_new, 0.0)
        h = jnp.where(v, h_new, h)
        return h, h_out

    h0 = jnp.zeros((B, H), x.dtype)
    hT, outs = jax.lax.scan(step, h0, (gates_x, vs))
    if reverse:
        outs = outs[::-1]
    return jnp.swapaxes(outs, 0, 1), hT
