"""Benchmark: HCM teacher-forced policy forward throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

value    = frames/sec of the full-size hierarchical agent forward (frozen
           BERT-base instruction embedding + 4 ResNet50 passes per frame +
           cross-modal attention + both LSTMs), jitted, bfloat16 compute,
           teacher-forced windows of B x T frames.
vs_baseline = value / PyTorch-CPU frames/sec of the equivalent forward
           (benchmarks/torch_hcm.py), measured once and cached in
           benchmarks/baseline_cache.json.

Measurement method: the single-chip TPU here sits behind a host tunnel where
per-call dispatch costs ~30 ms and device->host transfers are slow, so naive
per-call timing is meaningless.  The forward is iterated K times INSIDE one
jitted lax.fori_loop (with a data dependence between iterations so XLA cannot
collapse them) returning a scalar; per-step time = (t(K1) - t(K0)) / (K1-K0),
which cancels both dispatch and the scalar-fetch round trip.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "benchmarks", "baseline_cache.json")


def measure_tpu_fps(batch=2, t=16, k=8):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    # fp32 by default: XLA lowers fp32 convs to bf16x3 MXU passes (~75 TFLOP/s
    # effective measured on this chip), while full-bf16 compilation is
    # pathologically slow on the current axon/libtpu combo (>10 min, observed
    # repeatedly). Opt in with BENCH_BF16=1 once the toolchain moves.
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16") else jnp.float32
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=batch, t=t,
        compute_dtype=dtype,
    )

    @jax.jit
    def f_k(obs, hh, lh):
        def body(i, carry):
            acc, hh, lh = carry
            obs_i = dict(obs)
            # data dependence between iterations so XLA can't collapse them
            obs_i["rgb"] = obs["rgb"] + acc * 1e-12
            logits, hh = high.apply(hparams, obs_i, hh, prev, masks)
            pred = jnp.argmax(logits, axis=-1)
            actions, stop, lh = low.apply(lparams, obs_i, lh, prev, masks, pred)
            return (jnp.mean(actions.astype(jnp.float32)), hh, lh)

        acc, hh, lh = jax.lax.fori_loop(0, k, body, (jnp.float32(0), hh, lh))
        return acc

    @jax.jit
    def f_0(obs):
        return jnp.mean(obs["progress"])  # dispatch + scalar-fetch overhead

    float(f_k(obs, hh, lh))  # compile + warmup
    float(f_0(obs))

    def timed(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_k = timed(lambda: f_k(obs, hh, lh))
    t_0 = timed(lambda: f_0(obs))
    per_step = max(t_k - t_0, 1e-9) / k
    frames = batch * t
    return frames / per_step, per_step


def get_torch_baseline_fps():
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["torch_cpu_fps"]
    sys.path.insert(0, REPO)
    from benchmarks.torch_hcm import measure_torch_cpu_fps

    fps = measure_torch_cpu_fps()
    with open(CACHE, "w") as f:
        json.dump({"torch_cpu_fps": fps, "ts": time.time()}, f)
    return fps


def main():
    baseline_fps = get_torch_baseline_fps()
    tpu_fps, step_time = measure_tpu_fps()
    result = {
        "metric": "HCM teacher-forced policy forward throughput",
        "value": round(float(tpu_fps), 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(float(tpu_fps / baseline_fps), 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
