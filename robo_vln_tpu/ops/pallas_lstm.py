"""Fused LSTM-sequence pallas kernel.

The recurrent hot loop of every policy is a masked LSTM over up to 1000
timesteps with a small batch (paper configs train at batch 1!).  Under
lax.scan, XLA emits one small (B x H)·(H x 4H) matmul per step with the carry
and W_hh round-tripping HBM every iteration.  This kernel runs the WHOLE
sequence in one pallas program:

  * W_hh (H x 4H) is loaded into VMEM once and stays resident for all T steps;
  * the precomputed input projections gates_x = x·W_ih + b (one big,
    MXU-efficient matmul done OUTSIDE the kernel) stream through VMEM;
  * h/c carries live in VMEM scratch; the per-step masked reset
    (state_encoder.py:64-70 semantics) is fused into the cell update.

Gate order is torch's (i, f, g, o), identical to ops/rnn.lstm_sequence, so the
two paths are interchangeable — and training uses a custom VJP whose backward
REPLAYS the lax.scan implementation (rematerialization), so the kernel needs
no hand-written gradient.

Grid: one program per batch tile (B padded to the fp32 sublane size 8); H must
be a multiple of 128 (lane width).  Falls back to the scan implementation for
unaligned shapes or non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUBLANE = 8
_LANE = 128


def _lstm_kernel(gates_x_ref, masks_ref, h0_ref, c0_ref, w_hh_ref,
                 outs_ref, hT_ref, cT_ref):
    T = gates_x_ref.shape[0]
    H = h0_ref.shape[1]
    w_hh = w_hh_ref[:]

    def step(t, carry):
        h, c = carry
        m = masks_ref[t, :]  # (B,)
        mcol = m[:, None]
        h = h * mcol
        c = c * mcol
        g = gates_x_ref[t] + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(g[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(g[:, 1 * H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:4 * H])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        outs_ref[t] = h_new
        return (h_new, c_new)

    hT, cT = jax.lax.fori_loop(0, T, step, (h0_ref[:], c0_ref[:]))
    hT_ref[:] = hT
    cT_ref[:] = cT


def _pallas_lstm_call(gates_x, masks, h0, c0, w_hh, interpret=False):
    T, B, four_h = gates_x.shape
    H = four_h // 4
    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lstm_kernel,
        out_shape=out_shape,
        in_specs=[vmem] * 5,
        out_specs=(vmem, vmem, vmem),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * 4 * H,
            bytes_accessed=(T * B * 4 * H + H * 4 * H + 2 * T * B * H) * 4,
            transcendentals=4 * T * B * H,
        ),
    )(
        gates_x.astype(jnp.float32), masks.astype(jnp.float32),
        h0.astype(jnp.float32), c0.astype(jnp.float32),
        w_hh.astype(jnp.float32),
    )


def _pad_batch(x, b_pad, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, b_pad)
    return jnp.pad(x, pad)


def pallas_ok(T: int, B: int, H: int) -> bool:
    if H % _LANE != 0:
        return False
    # VMEM budget: gates_x (T,B',4H) + outs (T,B',H) + w_hh (H,4H), fp32
    b_eff = max(B, _SUBLANE)
    bytes_needed = (T * b_eff * 5 * H + H * 4 * H + 3 * b_eff * H) * 4
    return bytes_needed < 100 * 1024 * 1024  # streamed refs may exceed VMEM;
    # the compiler spills large gates_x to ANY/HBM with windowed DMA


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_lstm_sequence(gates_x, masks, h0, c0, w_hh):
    """(outs (T,B,H), hT, cT) — pallas forward, scan-replay backward."""
    outs, hT, cT = _scan_impl(gates_x, masks, h0, c0, w_hh)
    return outs, hT, cT


def _scan_impl(gates_x, masks, h0, c0, w_hh):
    def step(carry, inp):
        h, c = carry
        gx, m = inp
        mcol = m[:, None]
        h = h * mcol
        c = c * mcol
        H = h.shape[-1]
        g = gx + h @ w_hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (hT, cT), outs = jax.lax.scan(step, (h0, c0), (gates_x, masks))
    return outs, hT, cT


def _fwd(gates_x, masks, h0, c0, w_hh):
    import os

    T, B, four_h = gates_x.shape
    H = four_h // 4
    # Default ON for aligned shapes on TPU (measured >= the scan end-to-end;
    # the earlier "pathological compile" was a params-closure artifact, see
    # docs/TPU_ENV_NOTES.md). ROBO_VLN_DISABLE_PALLAS=1 forces the scan core.
    use_pallas = (
        jax.default_backend() == "tpu"
        and pallas_ok(T, B, H)
        and not os.environ.get("ROBO_VLN_DISABLE_PALLAS")
    )
    if use_pallas:
        b_pad = (-B) % _SUBLANE
        if b_pad:
            gx = _pad_batch(gates_x, b_pad, 1)
            mk = _pad_batch(masks, b_pad, 1)
            h0p = _pad_batch(h0, b_pad, 0)
            c0p = _pad_batch(c0, b_pad, 0)
            outs, hT, cT = _pallas_lstm_call(gx, mk, h0p, c0p, w_hh)
            outs, hT, cT = outs[:, :B], hT[:B], cT[:B]
        else:
            outs, hT, cT = _pallas_lstm_call(gates_x, masks, h0, c0, w_hh)
    else:
        outs, hT, cT = _scan_impl(gates_x, masks, h0, c0, w_hh)
    return (outs, hT, cT), (gates_x, masks, h0, c0, w_hh)


def _bwd(residuals, grads):
    # rematerialize: replay the scan implementation and differentiate it
    _, vjp = jax.vjp(_scan_impl, *residuals)
    return vjp(grads)


fused_lstm_sequence.defvjp(_fwd, _bwd)


def lstm_sequence_fused(x, h0, c0, masks, w_ih, w_hh, b):
    """Drop-in for ops.rnn.lstm_sequence with the fused recurrent core.

    x (T,B,D), masks (T,B). The input projection stays a single large matmul.
    """
    gates_x = jnp.einsum("tbd,dk->tbk", x, w_ih) + b
    outs, hT, cT = fused_lstm_sequence(gates_x, masks, h0, c0, w_hh)
    return outs, (hT, cT)
