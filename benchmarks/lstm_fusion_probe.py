"""Probe: is fusing the HCM high/low LSTM scans into ONE stacked scan worth it?

The hierarchical train step runs two independent masked-LSTM sequences (the
low level trains on ORACLE sub-goals, hierarchical_trainer.py:522-535, so the
two recurrences share no data).  Under one jitted program XLA still executes
the two scans back to back — 2T sequential cell updates (plus 2T more in the
backward replay).  A stacked 2-cell scan does T batched cell updates instead:
same FLOPs, half the sequential latency, which is exactly what the
feature-mode step is bound by (docs/ROUND3.md).

Measures, fwd+bwd at train shapes (T=50, B=4, H=512, f32 like the step's
recurrent core):
  two_seq  — grad through two sequential fused-LSTM calls (today's path)
  stacked  — grad through one 2-cell stacked lax.scan (the proposed path)

Run: python benchmarks/lstm_fusion_probe.py  (real chip; one process)

MEASURED (v5e, 2026-08-17): two_seq 0.56 ms vs stacked 0.90 ms (fwd+bwd,
overhead-subtracted) — the pallas fused kernel (W_hh VMEM-resident,
ops/pallas_lstm.py) beats the stacked lax.scan even at 2x the sequential
length, so the fusion is NOT adopted.  Corollary: both recurrences together
are <1 ms of the ~38 ms feature-mode step — the step is NOT LSTM-bound
(see benchmarks/feature_step_profile.py for the real breakdown).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from robo_vln_tpu.ops.pallas_lstm import lstm_sequence_fused

    T, B, H = 50, 4, 512
    D_HI, D_LO = 896, 416
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    x_hi, x_lo = mk(T, B, D_HI), mk(T, B, D_LO)
    masks = jnp.ones((T, B), jnp.float32)
    params = {
        "hi": {"w_ih": mk(D_HI, 4 * H) * 0.02, "w_hh": mk(H, 4 * H) * 0.02,
               "b": jnp.zeros((4 * H,))},
        "lo": {"w_ih": mk(D_LO, 4 * H) * 0.02, "w_hh": mk(H, 4 * H) * 0.02,
               "b": jnp.zeros((4 * H,))},
    }
    h0 = jnp.zeros((B, H), jnp.float32)

    def two_seq_loss(params, x_hi, x_lo, masks):
        o1, _ = lstm_sequence_fused(
            x_hi, h0, h0, masks, params["hi"]["w_ih"], params["hi"]["w_hh"],
            params["hi"]["b"])
        o2, _ = lstm_sequence_fused(
            x_lo, h0, h0, masks, params["lo"]["w_ih"], params["lo"]["w_hh"],
            params["lo"]["b"])
        return jnp.mean(o1) + jnp.mean(o2)

    def stacked_loss(params, x_hi, x_lo, masks):
        gx_hi = jnp.einsum("tbd,dk->tbk", x_hi, params["hi"]["w_ih"]) + params["hi"]["b"]
        gx_lo = jnp.einsum("tbd,dk->tbk", x_lo, params["lo"]["w_ih"]) + params["lo"]["b"]
        gx = jnp.stack([gx_hi, gx_lo], axis=1)  # (T, 2, B, 4H)
        w_hh = jnp.stack([params["hi"]["w_hh"], params["lo"]["w_hh"]])  # (2,H,4H)

        def step(carry, inp):
            h, c = carry
            gxt, m = inp  # (2,B,4H), (B,)
            mcol = m[None, :, None]
            h = h * mcol
            c = c * mcol
            g = gxt + jnp.einsum("nbh,nhk->nbk", h, w_hh)
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        hc0 = jnp.zeros((2, B, H), jnp.float32)
        (_, _), outs = jax.lax.scan(step, (hc0, hc0), (gx, masks))
        return jnp.mean(outs)

    two_seq_g = jax.jit(jax.grad(two_seq_loss))
    stacked_g = jax.jit(jax.grad(stacked_loss))

    @jax.jit
    def trivial(masks):
        return jnp.mean(masks)

    def fetch(g):
        return float(jnp.sum(g["hi"]["w_hh"]))

    args = (params, x_hi, x_lo, masks)
    fetch(two_seq_g(*args))
    fetch(stacked_g(*args))
    float(trivial(masks))

    def timed(fn, post, reps=10):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            post(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t0 = min(timed(lambda *_: trivial(masks), float) for _ in range(2))
    t_two = timed(two_seq_g, fetch) - t0
    t_stk = timed(stacked_g, fetch) - t0
    print(json.dumps({
        "t_trivial_ms": round(t0 * 1e3, 3),
        "two_seq_ms": round(t_two * 1e3, 3),
        "stacked_ms": round(t_stk * 1e3, 3),
        "speedup": round(t_two / t_stk, 3),
        "shapes": {"T": T, "B": B, "H": H},
    }))


if __name__ == "__main__":
    main()
