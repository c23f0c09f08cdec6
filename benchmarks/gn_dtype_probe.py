"""Probe: GroupNorm output dtype in the frozen DDPPO depth trunk.

The GN layers were pinned to f32 outputs (dtype=jnp.float32) while the
convs run bf16 — every GN materializes an f32 tensor the next conv casts
back down, doubling the normalize-pass bytes of an already HBM-bound
trunk (13.8 ms measured for 200 frames @256 — ~10% MXU efficiency,
benchmarks/feature_step_profile.py trunk_depth).  Flax computes the GN
statistics in f32 either way; `norm_dtype` only changes the output dtype.

Measures GNResNetEncoder fwd (200,256,256,1) bf16 compute with
norm_dtype=f32 vs norm_dtype=bf16, plus max |delta| of the outputs.

Run: python benchmarks/gn_dtype_probe.py   (real chip, one process)

MEASURED (v5e, 2026-08-17): gn_f32 3.57 ms, gn_bf16 7.19 ms, max delta
0.0 — flax computes the GN statistics AND the normalize in f32 either way
(norm_dtype only casts the output, which the next conv re-casts), so the
variant is numerically identical and the timing delta is tunnel-dispatch
noise.  GN-bf16 REJECTED; `norm_dtype` stays f32 by default.  NOTE the
absolute number vs trunk_depth 13.8 ms (feature_step_profile) /
direct_bf16 12.9 ms (trunk_gap_probe): same program, ±4 ms dispatch
variance per overhead probe — single-run ms-level deltas on this tunnel
are not trustworthy; see trunk_gap_probe.py.  Methodology caveat: this
probe compiles FOUR model-sized programs in one process (two variants x
two batch shapes), deviating from the one-compile-per-process rule
(docs/TPU_ENV_NOTES.md) that bench.py/feature_step_profile.py follow —
a further reason its absolute timings are indicative only.
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

    from robo_vln_tpu.models.encoders.resnet import GNResNetEncoder

    n = 200
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, 256, 256, 1)), jnp.bfloat16)

    enc32 = GNResNetEncoder(compute_dtype=jnp.bfloat16, norm_dtype=jnp.float32)
    enc16 = GNResNetEncoder(compute_dtype=jnp.bfloat16, norm_dtype=jnp.bfloat16)
    params = enc32.init(jax.random.PRNGKey(0), x[:1])["params"]
    params = jax.device_put(params, jax.devices()[0])

    f32 = jax.jit(lambda p, x: enc32.apply({"params": p}, x))
    f16 = jax.jit(lambda p, x: enc16.apply({"params": p}, x))

    a = np.asarray(f32(params, x[:8]), np.float32)
    b = np.asarray(f16(params, x[:8]), np.float32)
    delta = float(np.max(np.abs(a - b)))

    @jax.jit
    def trivial(x):
        return jnp.mean(x[0, 0, 0])

    def timed(fn, reps=10):
        jax.block_until_ready(fn(params, x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    from benchmarks.stem_probe import measure_overhead

    float(trivial(x))
    t0 = measure_overhead(lambda: float(trivial(x)))
    print(json.dumps({
        "gn_f32_ms": round((timed(f32) - t0) * 1e3, 3),
        "gn_bf16_ms": round((timed(f16) - t0) * 1e3, 3),
        "max_abs_delta": delta,
    }))


if __name__ == "__main__":
    main()
