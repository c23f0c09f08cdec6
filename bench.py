"""Benchmark: HCM IL train-step + policy-forward throughput on TPU.

Prints ONE JSON line:
  {"metric": "HCM IL train-step throughput", "value": N,
   "unit": "frames/sec/chip", "vs_baseline": N, "batch": B, "t": T,
   "step_ms": N, "train_fps_by_batch": {...}, "forward_fps": N,
   "forward_vs_baseline": N, "feature_train_fps": N, "flops_per_frame": N,
   "tflops": N, "mfu": N, "peak_tflops_bf16": N, "torch_threads": N}

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
value    is the best config from a raw-step batch sweep (BENCH_SWEEP,
           default "4,8"); tflops/mfu = measured rate x analytic FLOPs/frame
           (HLO cost analysis of the lowered program, measure_flops) against
           the v5e bf16 peak (197 TFLOP/s, BENCH_PEAK_TFLOPS to override).

Measurement method: the single-chip TPU here sits behind a host tunnel where
per-call dispatch costs ~30 ms and device->host transfers are slow, so naive
per-call timing is meaningless; and the remote-compile service reliably serves
about ONE model-sized compile per process.  So each measurement runs in its
OWN subprocess: params initialize on the host CPU, the single big compile is
the measured program (B x T frames, scalar fetch), and the per-call overhead
measured with a trivial jitted function is subtracted.
per_frame = (t_prog - t_trivial) / (B*T).  See docs/TPU_ENV_NOTES.md.

Budget contract (round-5): the whole run is bounded by BENCH_BUDGET_S
(default 1500 s) of wall clock.  The FLOPs analysis (CPU-only, never touches
the tunnel) and the headline train measurement run first, and a complete
best-so-far JSON line is (re)printed after EVERY successful measurement —
the driver parses the LAST JSON line of the tail, so a timeout/SIGTERM
mid-extras still leaves a valid headline line behind.  Every further
measurement (forward, batch sweep, feature mode) launches only if the
remaining budget covers its worst-case estimate.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "benchmarks", "baseline_cache.json")

# global wall-clock budget: the round-4 bench (7+ unbudgeted subprocesses,
# single JSON line at the very end) blew the driver window and lost ALL
# measurements (BENCH_r04.json rc=124, empty tail).  Everything below is
# gated on _remaining().
T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500.0))


def _remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def _timed(fn, xs, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*xs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _build_forward(batch=4, t=50):
    """Teacher-forced HCM forward program + args (shared by the timed TPU
    path and the CPU FLOPs-analysis path)."""
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

    args = (hparams, lparams, obs, masks, prev, hh, lh)
    return fwd, args, masks


def measure_tpu_fps(batch=4, t=50, reps=7):
    import jax
    import jax.numpy as jnp

    fwd, args, masks = _build_forward(batch, t)

    @jax.jit
    def trivial(masks):  # per-call dispatch + scalar-fetch overhead probe
        return jnp.mean(masks)

    float(fwd(*args))  # the ONE model-sized remote compile
    float(trivial(masks))

    t_fwd = _timed(fwd, args, reps)
    t_0 = _timed(trivial, (masks,), reps)
    per_frame = max(t_fwd - t_0, 1e-9) / (batch * t)
    return 1.0 / per_frame


def _build_train_step(batch=None, t=None, feature_mode=False):
    """Full hierarchical IL train-step program + args (shared by the timed
    TPU path and the CPU FLOPs-analysis path).

    feature_mode=True builds the feature-store training step
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

    return step, run, (state, hh, lh, batch_data), masks, batch, t


def measure_tpu_train_fps(batch=None, t=None, reps=5, feature_mode=False):
    """Time the full hierarchical IL train step (grads + AdamW high / Adam
    low) as one jitted program, same overhead-subtraction method."""
    import jax
    import jax.numpy as jnp

    _, run, (state, hh, lh, batch_data), masks, batch, t = _build_train_step(
        batch, t, feature_mode
    )

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


def measure_flops(which: str):
    """Analytic FLOPs of the measured program at its exact shapes, from XLA's
    HLO cost analysis on the *lowered* (pre-backend-optimization) module —
    run in a CPU-pinned process: lowering only traces (no device compile, no
    remote-compile budget), and the algorithmic FLOP count is
    backend-independent.  Conv/matmul FLOPs dominate and follow the standard
    2*MACs convention, so fps x flops/frame / peak gives MFU directly."""
    import jax

    if which == "forward":
        fwd, args, _ = _build_forward()
        lowered = fwd.lower(*args)
        batch = args[2]["instruction"].shape[0]
        t = args[3].shape[1]
    else:
        step, _, (state, hh, lh, batch_data), masks, batch, t = (
            _build_train_step(feature_mode=(which == "train_feat"))
        )
        lowered = step.lower(state, hh, lh, batch_data, 1e-4, 1e-4)
    flops = float(lowered.cost_analysis()["flops"])
    return {"flops": flops, "flops_per_frame": flops / (batch * t),
            "batch": batch, "t": t}


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


# TPU v5e (v5 lite) bf16 peak per chip; override for other hardware.
PEAK_BF16_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def _measure_in_subprocess(which: str, tries: int = 2, extra_env=None,
                           cpu: bool = False):
    """Each model-sized compile gets its own process (compile-budget rule).

    cpu=True pins the subprocess to the host CPU backend (FLOPs analysis:
    lowering only, never touches the tunneled device).  Returns the parsed
    JSON dict from the subprocess, or None."""
    env = dict(os.environ)
    env.update(extra_env or {})
    if cpu:
        env["BENCH_FORCE_CPU"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
    t_start = time.time()
    for attempt in range(tries):
        left = _remaining()
        if left < 90:
            print(f"# bench {which}: skipped, {left:.0f}s of budget left",
                  file=sys.stderr)
            return None
        # the child's device-wait loop must fit inside what's left, and the
        # child itself is hard-capped at the remaining budget (+grace)
        env["BENCH_DEVICE_WAIT"] = str(int(max(60, min(600, left * 0.5))))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--measure", which],
                cwd=REPO, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
                timeout=max(120, min(3300, left + 30)),
            )
        except subprocess.TimeoutExpired:
            print(f"# bench {which} attempt {attempt} timed out",
                  file=sys.stderr)
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, dict):
                if not cpu:  # feed the adaptive extras estimate
                    _DEVICE_DURATIONS.append(time.time() - t_start)
                return parsed
        print(
            f"# bench {which} attempt {attempt} failed rc={proc.returncode}: "
            + proc.stderr[-500:].replace("\n", " | "),
            file=sys.stderr,
        )
        if attempt < tries - 1 and _remaining() > 300:
            time.sleep(60)
    return None


_DEVICE_DURATIONS = []  # successful device-measurement wall times


def _device_est(default=540.0):
    """Adaptive worst-case estimate for the next device measurement: the
    slowest observed success (+10%), once one exists."""
    if _DEVICE_DURATIONS:
        return max(_DEVICE_DURATIONS) * 1.1
    return default


def _measure_fps(which, tries=2, extra_env=None):
    r = _measure_in_subprocess(which, tries=tries, extra_env=extra_env)
    return None if r is None else r.get("fps")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        which = sys.argv[2]
        if which.startswith("flops_"):
            # CPU-pinned analysis process (see _measure_in_subprocess): the
            # ambient axon plugin force-appends itself to jax_platforms, so
            # pin the config flag before first device use (TPU_ENV_NOTES.md)
            import jax

            jax.config.update("jax_platforms", "cpu")
            print(json.dumps(measure_flops(which[len("flops_"):])))
            return
        if not wait_for_device(
            max_wait=float(os.environ.get("BENCH_DEVICE_WAIT", 900))
        ):
            print("# device never answered within BENCH_DEVICE_WAIT",
                  file=sys.stderr)
            sys.exit(3)
        if which == "forward":
            fps = measure_tpu_fps()
        elif which == "train_feat":
            fps = measure_tpu_train_fps(feature_mode=True)
        else:
            fps = measure_tpu_train_fps()
        print(json.dumps({"fps": fps}))
        return

    cache = get_torch_baselines()
    bench_t = int(os.environ.get("BENCH_T", 50))
    base_b = int(os.environ.get("BENCH_BATCH", 4))
    # extra sweep points beyond the headline batch (time-permitting)
    sweep = [
        int(x) for x in os.environ.get("BENCH_SWEEP", "4,8").split(",")
        if x and int(x) != base_b
    ]

    st = {"train_by_batch": {}, "flops_by_batch": {}, "fwd": None,
          "feat": None, "feat16": None}

    def emit():
        """(Re)print the complete best-so-far JSON line — the driver parses
        the LAST JSON line of the tail, so every successful measurement
        must leave a valid headline behind immediately."""
        tbb, fbb = st["train_by_batch"], st["flops_by_batch"]
        best_b = max(tbb, key=tbb.get) if tbb else None
        if best_b is not None:
            train_fps = tbb[best_b]
            result = {
                "metric": "HCM IL train-step throughput",
                "value": round(float(train_fps), 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(
                    float(train_fps / cache["torch_cpu_train_fps"]), 2
                ),
                "batch": best_b,
                "t": bench_t,
                "step_ms": round(
                    best_b * bench_t / float(train_fps) * 1e3, 2
                ),
            }
            if len(tbb) > 1:
                result["train_fps_by_batch"] = {
                    str(b): round(float(f), 2) for b, f in sorted(tbb.items())
                }
            # hardware efficiency: analytic FLOPs (HLO cost analysis at the
            # headline batch, or the nearest measured batch) x rate / peak
            fl_b = best_b if best_b in fbb else (
                sorted(fbb)[0] if fbb else None
            )
            if fl_b is not None:
                tflops = float(train_fps) * fbb[fl_b] / 1e12
                result["flops_per_frame"] = round(fbb[fl_b])
                result["tflops"] = round(tflops, 2)
                result["mfu"] = round(tflops / PEAK_BF16_TFLOPS, 4)
                result["peak_tflops_bf16"] = PEAK_BF16_TFLOPS
                if fl_b != best_b:
                    result["flops_batch"] = fl_b
        elif st["fwd"] is not None:  # headline falls back to the
            # measurement that succeeded — the contract is one JSON line
            # with numeric value/vs_baseline
            result = {
                "metric": "HCM teacher-forced policy forward throughput",
                "value": round(float(st["fwd"]), 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(
                    float(st["fwd"] / cache["torch_cpu_fps"]), 2
                ),
            }
        else:
            return
        if st["fwd"] is not None:
            result["forward_fps"] = round(float(st["fwd"]), 2)
            result["forward_vs_baseline"] = round(
                float(st["fwd"] / cache["torch_cpu_fps"]), 2
            )
        if st["feat"] is not None:
            # feature-store training mode (DAGGER.PRELOAD_TRUNK_FEATURES)
            result["feature_train_fps"] = round(float(st["feat"]), 2)
        if st["feat16"] is not None:
            result["feature_train_fps_b16"] = round(float(st["feat16"]), 2)
        result["budget_s"] = BUDGET_S
        result["elapsed_s"] = round(time.time() - T0, 1)
        result["torch_threads"] = cache.get("torch_threads")
        print(json.dumps(result), flush=True)

    def flops_for(b):
        fl = _measure_in_subprocess(
            "flops_train", tries=1, cpu=True,
            extra_env={"BENCH_BATCH": str(b)},
        )
        if fl and fl.get("flops_per_frame"):
            st["flops_by_batch"][b] = fl["flops_per_frame"]

    # 1. FLOPs analysis first: CPU-only lowering, never touches the flaky
    #    tunnel, and makes the FIRST train line carry tflops/mfu already.
    if _remaining() > 600:
        flops_for(base_b)

    # 2. the headline: full hierarchical IL train step at the default batch
    fps = _measure_fps("train", tries=2, extra_env={"BENCH_BATCH": str(base_b)})
    if fps is not None:
        st["train_by_batch"][base_b] = fps
        emit()

    # 3..n extras, strictly time-permitting, cheapest-information-first;
    #    each success immediately re-emits the full line.  A device
    #    measurement behind this tunnel is wait + ~7 min compile + reps;
    #    once one succeeded, the estimate adapts to the observed durations.
    if _remaining() > _device_est() and st["fwd"] is None:
        st["fwd"] = _measure_fps("forward", tries=1)
        if st["fwd"] is not None:
            emit()
    for b in sweep:
        if _remaining() < _device_est():
            break
        fps = _measure_fps("train", tries=1, extra_env={"BENCH_BATCH": str(b)})
        if fps is not None:
            st["train_by_batch"][b] = fps
            if max(st["train_by_batch"], key=st["train_by_batch"].get) == b \
                    and _remaining() > 240:
                flops_for(b)  # keep mfu tied to the (new) headline batch
            emit()
    if _remaining() > _device_est():
        st["feat"] = _measure_fps("train_feat", tries=1)
        if st["feat"] is not None:
            emit()
    if st["feat"] is not None and _remaining() > _device_est():
        # feature mode has no conv activations, so the per-chip batch can
        # grow to amortize the sequential LSTM latency (r3: ~1.5x at B=16)
        st["feat16"] = _measure_fps("train_feat", tries=1,
                                    extra_env={"BENCH_BATCH": "16"})
        if st["feat16"] is not None:
            emit()

    if not st["train_by_batch"] and st["fwd"] is None:
        raise RuntimeError("all bench subprocesses failed")
    emit()  # final (possibly identical) line


if __name__ == "__main__":
    main()
