"""Microbenchmark: fused pallas cross-modal attention vs plain XLA on the
real chip, at the HCM Visual_Ling_Attn shapes (N=B*T examples of L=200
instruction queries x S visual tokens, h=4 heads).

Same overhead-subtraction method as bench.py (docs/TPU_ENV_NOTES.md): both
variants jitted with inputs as arguments, per-call dispatch overhead probed
with a trivial jitted op and subtracted.

Prints one JSON line per shape:
  {"S": 16, "xla_us": ..., "pallas_us": ..., "speedup": ...}
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from robo_vln_tpu.ops.cm_attention import mha_attention
from robo_vln_tpu.ops.pallas_attention import _pallas_attention


def _timed(fn, xs, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*xs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(N=200, L=200, S=16, h=4, D=256, dtype=jnp.bfloat16, reps=7):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((N, L, D)), dtype)
    k = jnp.asarray(rng.standard_normal((N, S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((N, S, D)), dtype)

    @jax.jit
    def xla(q, k, v):
        return jnp.sum(mha_attention(q, k, v, h).astype(jnp.float32))

    @jax.jit
    def fused(q, k, v):
        return jnp.sum(_pallas_attention(q, k, v, h).astype(jnp.float32))

    @jax.jit
    def trivial(q):
        return jnp.sum(q[0, 0].astype(jnp.float32))

    float(xla(q, k, v))
    float(fused(q, k, v))
    float(trivial(q))
    t_xla = _timed(xla, (q, k, v), reps)
    t_fused = _timed(fused, (q, k, v), reps)
    t_0 = _timed(trivial, (q,), reps)
    xla_us = max(t_xla - t_0, 1e-9) * 1e6
    pallas_us = max(t_fused - t_0, 1e-9) * 1e6
    print(json.dumps({
        "N": N, "L": L, "S": S, "h": h, "D": D,
        "xla_us": round(xla_us, 1), "pallas_us": round(pallas_us, 1),
        "speedup": round(xla_us / pallas_us, 2),
    }))


if __name__ == "__main__":
    run(S=16)   # rgb tokens
    run(S=64)   # depth tokens
