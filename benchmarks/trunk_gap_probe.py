"""Probe: why does the depth trunk cost 13.8 ms inside trunk_fn but 3.6 ms
standalone (gn_dtype_probe)?

Candidates isolated one per program, same process, N=200 @256:
  direct_bf16   gn.apply on a bf16 (200,256,256,1) input  [gn_dtype_probe]
  direct_f16    same but float16 input (the batch's transfer dtype)
  via_trunk     trunk_fn(hp, ...) consuming depth_features only (the
                feature_step_profile trunk_depth program: policy params,
                (B,T,...) reshape, stop_gradient)

Run: python benchmarks/trunk_gap_probe.py   (real chip, one process)

MEASURED (v5e, 2026-08-17): direct_bf16 12.9, direct_f16 12.3, via_trunk
10.5 ms — (a) the f16 transfer dtype costs nothing on-device (conversion
is free inside the first fusion), (b) trunk_fn adds no overhead, (c) the
gn_dtype_probe 3.6 ms outlier for the identical program was overhead-probe
variance (the trivial-dispatch baseline swings 26-34 ms on this tunnel;
deltas under ~5 ms need many repeated runs to trust).  Depth-trunk conv
micro-optimization dropped: the production training path (feature store)
bypasses the trunks entirely, and the eval tick is dispatch-bound.
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

    import __graft_entry__ as g
    from robo_vln_tpu.models import make_shared_trunk_fn
    from robo_vln_tpu.models.encoders.resnet import GNResNetEncoder

    batch, t = 4, 50
    dtype = jnp.bfloat16
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=batch, t=t,
        compute_dtype=dtype,
    )
    hp = hparams["params"]
    h_extra = {k: v for k, v in hparams.items() if k != "params"}
    trunk_fn = make_shared_trunk_fn(cfg.MODEL, dtype, h_extra)
    dev = jax.devices()[0]
    hp, obs = jax.device_put((hp, {"rgb": obs["rgb"], "depth": obs["depth"]}),
                             dev)
    jax.block_until_ready(hp)

    gn = GNResNetEncoder(
        spatial_size=256, blocks=tuple(cfg.MODEL.DEPTH_ENCODER.blocks),
        compute_dtype=dtype,
    )
    gparams = hp["depth_encoder"]["visual_encoder"]
    n = batch * t
    depth_flat_f16 = jax.device_put(
        jnp.reshape(obs["depth"], (n, 256, 256, 1)).astype(jnp.float16), dev
    )
    depth_flat_bf16 = jax.device_put(depth_flat_f16.astype(jnp.bfloat16), dev)
    jax.block_until_ready(depth_flat_bf16)

    direct = jax.jit(lambda p, x: jnp.mean(
        gn.apply({"params": p}, x).astype(jnp.float32)))

    @jax.jit
    def via_trunk(hp, o):
        f = trunk_fn(hp, o)
        return jnp.mean(f["depth_features"].astype(jnp.float32))

    @jax.jit
    def trivial(x):
        return jnp.mean(x[0, 0])

    progs = {
        "direct_bf16": lambda: direct(gparams, depth_flat_bf16),
        "direct_f16": lambda: direct(gparams, depth_flat_f16),
        "via_trunk": lambda: via_trunk(hp, obs),
    }
    out = {}
    for name, fn in progs.items():
        float(fn())
        float(trivial(depth_flat_bf16))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        t_prog = min(ts)
        from benchmarks.stem_probe import measure_overhead

        t_0 = measure_overhead(lambda: float(trivial(depth_flat_bf16)))
        out[name] = round((t_prog - t_0) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
