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
per-call timing is meaningless; and the remote-compile service reliably serves
about ONE model-sized compile per process.  So: params initialize on the host
CPU, the single big compile is the measured forward (B x T frames, scalar
output), and the per-call overhead measured with a trivial jitted function is
subtracted.  per_frame = (t_fwd - t_trivial) / (B*T).  See
docs/TPU_ENV_NOTES.md for the environment behavior behind this design.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "benchmarks", "baseline_cache.json")


def measure_tpu_fps(batch=4, t=50, reps=7):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    # bfloat16 MXU compute by default (BENCH_FP32=1 to compare); earlier
    # "bf16 never compiles" observations were the params-closure bug, not bf16
    dtype = jnp.float32 if os.environ.get("BENCH_FP32") else jnp.bfloat16

    # _hcm_setup initializes params on the host CPU (see its docstring);
    # arrays move to the accelerator lazily on first use.
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=batch, t=t,
        compute_dtype=dtype,
    )

    # params MUST be jit arguments: closed-over arrays are serialized as
    # constants into the remote-compile request, which rejects model-sized
    # bodies with HTTP 413 (docs/TPU_ENV_NOTES.md)
    @jax.jit
    def fwd(hparams, lparams, obs, masks, prev, hh, lh):
        logits, hh = high.apply(hparams, obs, hh, prev, masks)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low.apply(lparams, obs, lh, prev, masks, pred)
        return jnp.mean(actions.astype(jnp.float32))

    @jax.jit
    def trivial(masks):  # per-call dispatch + scalar-fetch overhead probe
        return jnp.mean(masks)

    args = (hparams, lparams, obs, masks, prev, hh, lh)
    float(fwd(*args))  # the ONE model-sized remote compile
    float(trivial(masks))

    def timed(fn, xs):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_fwd = timed(fwd, args)
    t_0 = timed(trivial, (masks,))
    per_frame = max(t_fwd - t_0, 1e-9) / (batch * t)
    return 1.0 / per_frame, per_frame


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


def wait_for_device(max_wait=900):
    """Block until the (possibly draining) remote service answers a trivial
    op — compiling into a wedged service wastes the compile budget."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    while True:
        try:
            float(jnp.ones((8,), jnp.float32).sum())
            return True
        except Exception:
            if time.time() - t0 > max_wait:
                return False
            time.sleep(30)


def main():
    baseline_fps = get_torch_baseline_fps()
    wait_for_device()
    # the tunneled remote-compile service occasionally drops long compiles
    # (docs/TPU_ENV_NOTES.md); retry once after a drain pause
    try:
        tpu_fps, step_time = measure_tpu_fps()
    except Exception as e:  # noqa: BLE001
        print(f"# bench retry after: {type(e).__name__}", file=sys.stderr)
        time.sleep(120)
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
