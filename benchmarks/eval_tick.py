#!/usr/bin/env python3
"""Closed-loop eval control tick (hot loop #3): one B=1 single-step HCM
policy program — high-level sub-goal argmax feeding the low level — measured
with the bench.py overhead-subtraction method, with and without shared
frozen trunks (the production eval path shares; TICK_NO_SHARE=1 compares).

    python benchmarks/eval_tick.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from robo_vln_tpu.models import make_shared_trunk_fn

    dtype = jnp.float32 if os.environ.get("BENCH_FP32") else jnp.bfloat16
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=1, t=1,
        compute_dtype=dtype,
    )
    share = not os.environ.get("TICK_NO_SHARE")
    trunk_fn = None
    if share:
        lparams = g._sync_frozen_trunks(hparams, lparams)
        trunk_fn = make_shared_trunk_fn(
            cfg.MODEL, dtype, {"batch_stats": hparams["batch_stats"]}
        )

    # eval-step shapes: (B, H, W, C) single-frame obs, (B,) mask
    obs1 = {k: (v[:, 0] if v.ndim > 2 and k != "instruction" else v)
            for k, v in obs.items()}
    obs1["progress"] = obs["progress"][:, 0:1]
    masks1 = masks[:, 0]
    prev1 = prev[:, 0]

    # production eval driver caches the frozen BERT embedding per episode
    # (evaluator.cached_instruction_embedding); TICK_NO_BERT_CACHE=1 compares
    cache_bert = not os.environ.get("TICK_NO_BERT_CACHE")
    if cache_bert:
        emb = high.apply(hparams, obs1["instruction"],
                         method="embed_instruction")
        obs1["instruction_embedding"] = jax.block_until_ready(emb)

    @jax.jit
    def tick(hparams, lparams, obs, hh, lh, prev, mask):
        if trunk_fn is not None:
            obs = {**obs, **trunk_fn(hparams["params"], obs)}
        logits, hh = high.apply(hparams, obs, hh, prev, mask)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low.apply(lparams, obs, lh, prev, mask, pred)
        return actions, stop, hh, lh

    @jax.jit
    def trivial(m):
        return jnp.sum(m)

    args = (hparams, lparams, obs1, hh, lh, prev1, masks1)
    out = tick(*args)  # the ONE model-sized compile
    jax.block_until_ready(out)
    float(trivial(masks1))

    def timed(fn, xs, reps=15):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_tick = timed(tick, args)
    t_0 = timed(trivial, (masks1,))
    on_device_ms = (t_tick - t_0) * 1e3
    print(json.dumps({
        "metric": "HCM closed-loop control tick (B=1)",
        "on_device_ms": round(on_device_ms, 2),
        "round_trip_ms": round(t_tick * 1e3, 2),
        "dispatch_overhead_ms": round(t_0 * 1e3, 2),
        "hz_capable_on_device": round(1e3 / max(on_device_ms, 1e-6), 1),
        "shared_trunks": share,
        "cached_bert": cache_bert,
    }))


if __name__ == "__main__":
    main()
