"""Benchmark: HCM IL train-step + policy-forward throughput on TPU.

Prints ONE JSON line:
  {"metric": "HCM IL train-step throughput", "value": N,
   "unit": "frames/sec/chip", "vs_baseline": N,
   "forward_fps": N, "forward_vs_baseline": N, "torch_threads": N}

value    = frames/sec of the full hierarchical IL TRAIN step — the reference's
           metric-critical hot loop (robo_vln_trainer.py:505-542 /
           hierarchical_trainer.py:492-560): forward (frozen BERT-base + four
           ResNet50 passes per frame + cross-modal attention + both LSTMs) +
           backward + AdamW/Adam updates, one jitted XLA program, bfloat16
           compute (remat off: the frozen trunks are stop_gradient'd).
forward_fps = frames/sec of the teacher-forced forward alone (round-1 metric,
           kept for continuity).
vs_baseline = each value / the equivalent PyTorch-CPU measurement
           (benchmarks/torch_hcm.py), measured once and cached in
           benchmarks/baseline_cache.json along with torch.get_num_threads().

Measurement method: the single-chip TPU here sits behind a host tunnel where
per-call dispatch costs ~30 ms and device->host transfers are slow, so naive
per-call timing is meaningless; and the remote-compile service reliably serves
about ONE model-sized compile per process.  So each measurement runs in its
OWN subprocess: params initialize on the host CPU, the single big compile is
the measured program (B x T frames, scalar fetch), and the per-call overhead
measured with a trivial jitted function is subtracted.
per_frame = (t_prog - t_trivial) / (B*T).  See docs/TPU_ENV_NOTES.md.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "benchmarks", "baseline_cache.json")


def _timed(fn, xs, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*xs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_tpu_fps(batch=4, t=50, reps=7):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    # bfloat16 MXU compute by default (BENCH_FP32=1 to compare)
    dtype = jnp.float32 if os.environ.get("BENCH_FP32") else jnp.bfloat16

    # _hcm_setup initializes params on the host CPU (see its docstring);
    # arrays move to the accelerator lazily on first use.
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=batch, t=t,
        compute_dtype=dtype,
    )

    # production path: frozen trunks identical between the modules -> one
    # shared ResNet pass per modality (TPU.SHARE_FROZEN_TRUNKS).
    # BENCH_NO_SHARE=1 measures the faithful two-pass forward.
    share = not os.environ.get("BENCH_NO_SHARE")
    trunk_fn = None
    if share:
        lparams = g._sync_frozen_trunks(hparams, lparams)
        from robo_vln_tpu.models import make_shared_trunk_fn

        trunk_fn = make_shared_trunk_fn(
            cfg.MODEL, dtype, {"batch_stats": hparams["batch_stats"]}
        )

    # params MUST be jit arguments: closed-over arrays are serialized as
    # constants into the remote-compile request, which rejects model-sized
    # bodies with HTTP 413 (docs/TPU_ENV_NOTES.md)
    @jax.jit
    def fwd(hparams, lparams, obs, masks, prev, hh, lh):
        if trunk_fn is not None:
            obs = {**obs, **trunk_fn(hparams["params"], obs)}
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

    t_fwd = _timed(fwd, args, reps)
    t_0 = _timed(trivial, (masks,), reps)
    per_frame = max(t_fwd - t_0, 1e-9) / (batch * t)
    return 1.0 / per_frame


def measure_tpu_train_fps(batch=None, t=None, reps=5, feature_mode=False):
    """Full hierarchical IL train step (grads + AdamW high / Adam low) as one
    jitted program, same overhead-subtraction method.

    feature_mode=True measures the feature-store training step
    (DAGGER.PRELOAD_TRUNK_FEATURES, training/featurize.py): batches carry
    precomputed f16 trunk features instead of raw frames, so the step is just
    the trainable stack.  BENCH_BATCH / BENCH_T env vars override the default
    B=4, T=50 (feature mode has no conv activations, so much larger per-chip
    batches amortize the sequential LSTM latency)."""
    batch = batch or int(os.environ.get("BENCH_BATCH", 4))
    t = t or int(os.environ.get("BENCH_T", 50))
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from robo_vln_tpu.parallel import mesh as mesh_lib
    from robo_vln_tpu.training import optimizers as opt_lib
    from robo_vln_tpu.training import steps as steps_lib

    dtype = jnp.float32 if os.environ.get("BENCH_FP32") else jnp.bfloat16
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=batch, t=t,
        compute_dtype=dtype,
    )
    mesh = mesh_lib.make_mesh([1, 1], ["data", "model"], jax.devices()[:1])

    # shared frozen trunks (production invariant; BENCH_NO_SHARE=1 compares)
    share = not os.environ.get("BENCH_NO_SHARE")
    if share:
        lparams = g._sync_frozen_trunks(hparams, lparams)

    hp, lp = hparams["params"], lparams["params"]
    h_extra = {k: v for k, v in hparams.items() if k != "params"}
    l_extra = {k: v for k, v in lparams.items() if k != "params"}
    trunk_fn = None
    if share:
        from robo_vln_tpu.models import make_shared_trunk_fn

        trunk_fn = make_shared_trunk_fn(cfg.MODEL, dtype, h_extra)

    class _B:
        def __init__(self, policy, extra):
            self._p, self._e = policy, extra

        def apply(self, variables, *args, **kwargs):
            return self._p.apply({**self._e, **variables}, *args, **kwargs)

    tx_h = opt_lib.masked(opt_lib.adamw(1e-5), hp)
    tx_l = opt_lib.masked(opt_lib.adam(0.0), lp)
    # eager zeros_like init: moments exist only for trainable leaves (masked)
    state = steps_lib.HierTrainState(
        steps_lib.TrainState(hp, tx_h.init(hp), jnp.asarray(0)),
        steps_lib.TrainState(lp, tx_l.init(lp), jnp.asarray(0)),
    )
    # remat=False: the frozen trunks are stop_gradient'd, so nothing large
    # needs saving and full-graph remat only re-runs them (1384 -> 2231 f/s)
    step = steps_lib.make_hier_train_step(
        _B(high, h_extra), _B(low, l_extra), tx_h, tx_l, mesh,
        donate=False, remat=False, trunk_fn=trunk_fn,
    )

    rng = np.random.default_rng(1)
    if feature_mode:
        # trunk outputs at the production shapes: TV ResNet50 @224 -> 7x7x2048,
        # GN depth ResNet50 @256 -> 8x8x32 (f16, as stored by featurize);
        # the per-episode frozen-BERT row rides along too, so the step never
        # runs BERT (training/featurize.py instruction_embedding)
        obs = {
            "instruction": obs["instruction"],
            "instruction_embedding": jnp.asarray(
                rng.standard_normal(
                    (batch, obs["instruction"].shape[1], 768)
                ), jnp.float16
            ),
            "progress": obs["progress"],
            "rgb_features": jnp.asarray(
                rng.standard_normal((batch, t, 7, 7, 2048)), jnp.float16
            ),
            "depth_features": jnp.asarray(
                rng.standard_normal((batch, t, 8, 8, 32)), jnp.float16
            ),
        }
    batch_data = {
        **obs,
        "vln_oracle_action_sensor": jnp.asarray(
            rng.integers(1, 5, (batch, t)), jnp.float32
        ),
        "prev_actions": prev,
        "corrected_actions": jnp.asarray(
            rng.random((batch, t, 2)), jnp.float32
        ),
        "oracle_stop": jnp.asarray(
            (rng.random((batch, t, 1)) > 0.7).astype(np.float32)
        ),
        "not_done_masks": masks,
        "valid_mask": jnp.ones((batch, t), jnp.float32),
    }

    def run(state, hh, lh, batch_data):
        new_state, hh, lh, metrics = step(state, hh, lh, batch_data, 1e-4, 1e-4)
        return new_state, hh, lh, metrics["high_level_loss"]

    @jax.jit
    def trivial(masks):
        return jnp.mean(masks)

    state, hh2, lh2, loss = run(state, hh, lh, batch_data)  # the ONE compile
    float(loss)
    float(trivial(masks))

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, hh2, lh2, loss = run(state, hh2, lh2, batch_data)
        float(loss)
        ts.append(time.perf_counter() - t0)
    t_step = min(ts)
    t_0 = _timed(trivial, (masks,), reps)
    per_frame = max(t_step - t_0, 1e-9) / (batch * t)
    return 1.0 / per_frame


def get_torch_baselines():
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    changed = False
    sys.path.insert(0, REPO)
    if "torch_cpu_fps" not in cache:
        from benchmarks.torch_hcm import measure_torch_cpu_fps

        cache["torch_cpu_fps"] = measure_torch_cpu_fps()
        changed = True
    if "torch_cpu_train_fps" not in cache:
        from benchmarks.torch_hcm import measure_torch_cpu_train_fps

        cache["torch_cpu_train_fps"] = measure_torch_cpu_train_fps()
        changed = True
    if "torch_threads" not in cache:
        import torch

        cache["torch_threads"] = torch.get_num_threads()
        changed = True
    if changed:
        cache["ts"] = time.time()
        with open(CACHE, "w") as f:
            json.dump(cache, f)
    return cache


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


def _measure_in_subprocess(which: str, tries: int = 2):
    """Each model-sized compile gets its own process (compile-budget rule)."""
    for attempt in range(tries):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", which],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, timeout=3600,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)["fps"]
            except (json.JSONDecodeError, KeyError):
                continue
        print(
            f"# bench {which} attempt {attempt} failed rc={proc.returncode}: "
            + proc.stderr[-500:].replace("\n", " | "),
            file=sys.stderr,
        )
        if attempt < tries - 1:
            time.sleep(120)
    return None


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        wait_for_device()
        which = sys.argv[2]
        if which == "forward":
            fps = measure_tpu_fps()
        elif which == "train_feat":
            fps = measure_tpu_train_fps(feature_mode=True)
        else:
            fps = measure_tpu_train_fps()
        print(json.dumps({"fps": fps}))
        return

    cache = get_torch_baselines()
    train_fps = _measure_in_subprocess("train")
    fwd_fps = _measure_in_subprocess("forward")
    feat_fps = _measure_in_subprocess("train_feat", tries=1)
    if train_fps is None and fwd_fps is None:
        raise RuntimeError("both bench subprocesses failed")
    if train_fps is not None:
        result = {
            "metric": "HCM IL train-step throughput",
            "value": round(float(train_fps), 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(
                float(train_fps / cache["torch_cpu_train_fps"]), 2
            ),
        }
    else:  # headline falls back to the measurement that succeeded — the
        # contract is one JSON line with numeric value/vs_baseline
        result = {
            "metric": "HCM teacher-forced policy forward throughput",
            "value": round(float(fwd_fps), 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(float(fwd_fps / cache["torch_cpu_fps"]), 2),
        }
    if fwd_fps is not None:
        result["forward_fps"] = round(float(fwd_fps), 2)
        result["forward_vs_baseline"] = round(
            float(fwd_fps / cache["torch_cpu_fps"]), 2
        )
    if feat_fps is not None:
        # feature-store training mode (DAGGER.PRELOAD_TRUNK_FEATURES)
        result["feature_train_fps"] = round(float(feat_fps), 2)
    result["torch_threads"] = cache.get("torch_threads")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
