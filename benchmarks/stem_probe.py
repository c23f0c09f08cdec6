"""Probe: is the ResNet stem (7x7 stride-2 conv) worth a space-to-depth
rewrite on TPU?

A 7x7 s2 conv over C=3 rgb (or C=1 depth) underfills the MXU's 128-wide
contraction.  The MLPerf-era transform packs 2x2 spatial blocks into
channels (224,224,3)->(112,112,12) and convolves with the SAME weights
rearranged into a 4x4 s1 kernel (one entry zero) — identical math, 4x the
contraction depth.

Measures, at the bench trunk shapes (N=200 frames, bf16):
  rgb_stem / rgb_s2d     7x7s2 C=3->64 @224 vs its s2d form
  depth_stem / depth_s2d 7x7s2 C=1->32 @256 vs its s2d form
and checks exact equivalence (f32) before timing.

Run: python benchmarks/stem_probe.py   (real chip, one process)

MEASURED (v5e, 2026-08-17): rgb_stem 0.94 ms vs rgb_s2d 5.55 ms (the
host-side reshape/transpose of the 60 MB input costs more than the conv —
XLA already lowers the C=3 stem well); depth_stem 1.27 vs depth_s2d 0.79.
Space-to-depth REJECTED: the stems are ~2.2 ms of the 29.7 ms trunk pair,
and the only win (depth, 0.5 ms) is noise-level.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def measure_overhead(trivial_call, reps=10):
    """min wall time of a trivial jitted dispatch (the per-call tunnel cost
    subtracted from every measurement — bench.py methodology)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        trivial_call()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def space_to_depth(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h // 2, w // 2, 4 * c)


def s2d_kernel(w7):
    """(7,7,C,F) stem kernel -> (4,4,4C,F) kernel over the s2d input."""
    import jax.numpy as jnp

    c, f = w7.shape[2], w7.shape[3]
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))  # kp = kh+1 in 0..7
    wp = wp.reshape(4, 2, 4, 2, c, f)           # (ai, dy, bi, dx, C, F)
    wp = wp.transpose(0, 2, 1, 3, 4, 5)         # (ai, bi, dy, dx, C, F)
    return wp.reshape(4, 4, 4 * c, f)


def main():
    import jax
    import jax.numpy as jnp

    n = 200
    rng = np.random.default_rng(0)
    results = {}

    for name, hw, cin, cout in (("rgb", 224, 3, 64), ("depth", 256, 1, 32)):
        x = jnp.asarray(rng.standard_normal((n, hw, hw, cin)), jnp.bfloat16)
        w7 = jnp.asarray(
            rng.standard_normal((7, 7, cin, cout)) * 0.05, jnp.bfloat16
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w7.shape, ("NHWC", "HWIO", "NHWC")
        )

        @jax.jit
        def stem(x, w7, dn=dn):
            return jax.lax.conv_general_dilated(
                x, w7, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
            )

        @jax.jit
        def s2d(x, w7):
            y = space_to_depth(x)
            w4 = s2d_kernel(w7)
            dn4 = jax.lax.conv_dimension_numbers(
                y.shape, w4.shape, ("NHWC", "HWIO", "NHWC")
            )
            return jax.lax.conv_general_dilated(
                y, w4, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn4
            )

        a = np.asarray(stem(x, w7), np.float32)
        b = np.asarray(s2d(x, w7), np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)  # bf16 noise

        @jax.jit
        def trivial(x):
            return jnp.mean(x[0, 0, 0])

        float(trivial(x))

        def timed(fn, reps=10):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(x, w7))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t0 = measure_overhead(lambda: float(trivial(x)))
        results[f"{name}_stem_ms"] = round((timed(stem) - t0) * 1e3, 3)
        results[f"{name}_s2d_ms"] = round((timed(s2d) - t0) * 1e3, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
