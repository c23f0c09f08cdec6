"""Where does the feature-mode train step's time go?

Times component programs of the feature-store hierarchical train step
(DAGGER.PRELOAD_TRUNK_FEATURES — bench.py measure_tpu_train_fps
feature_mode=True path) at the bench shapes, each in its OWN subprocess
(one model-sized remote compile per process, docs/TPU_ENV_NOTES.md):

  step         full train step (grads + AdamW/Adam updates + live dropout)
               [bench baseline]
  fwd          both policies' losses, forward only
  high_fwd     high-level policy forward + CE loss only
  low_fwd      low-level policy forward + MSE/BCE losses only
  bert         the frozen BERT instruction embedding alone
  grads        jax.grad of the combined loss, no dropout, no optimizer
  grads_drop   jax.grad with LIVE dropout (the step's actual loss) — the
               delta vs `grads` is the threefry random-bits cost
  grads_nobert jax.grad with the instruction embedding PRECOMPUTED (the
               proposed BERT-feature-store path), no dropout
  opt          optimizer update alone on precomputed zero grads

MEASURED (v5e, B=4 T=50, overhead-subtracted; see docs/ROUND3.md):
  step 35.97 | fwd 5.82 | bert 4.27 | grads 16.39 | opt 4.40 ms
  -> frozen BERT is ~73%% of the forward; step - (grads+opt) ~ 15 ms
     (dropout threefry + update tree-maps) — quantified by grads_drop.

Run: python benchmarks/feature_step_profile.py            (runs all modes)
     python benchmarks/feature_step_profile.py --measure <mode>
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
MODES = ["step", "fwd", "high_fwd", "low_fwd", "bert", "grads",
         "grads_drop", "grads_nobert", "opt",
         "trunks", "trunk_rgb", "trunk_depth"]


def _setup(batch=4, t=50, raw=False):
    import jax.numpy as jnp

    import __graft_entry__ as g
    from robo_vln_tpu.models import make_shared_trunk_fn
    from robo_vln_tpu.training import optimizers as opt_lib
    from robo_vln_tpu.training import steps as steps_lib

    dtype = jnp.bfloat16
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = g._hcm_setup(
        rgb_hw=224, depth_hw=256, instr_len=200, batch=batch, t=t,
        compute_dtype=dtype,
    )
    lparams = g._sync_frozen_trunks(hparams, lparams)
    hp, lp = hparams["params"], lparams["params"]
    h_extra = {k: v for k, v in hparams.items() if k != "params"}
    l_extra = {k: v for k, v in lparams.items() if k != "params"}
    trunk_fn = make_shared_trunk_fn(cfg.MODEL, dtype, h_extra)

    rng = np.random.default_rng(1)
    if not raw:  # feature-store batch (the default); raw=True keeps frames
        obs = {
            "instruction": obs["instruction"],
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
        "corrected_actions": jnp.asarray(rng.random((batch, t, 2)), jnp.float32),
        "oracle_stop": jnp.asarray(
            (rng.random((batch, t, 1)) > 0.7).astype(np.float32)
        ),
        "not_done_masks": masks,
        "valid_mask": jnp.ones((batch, t), jnp.float32),
    }
    # commit everything to the accelerator ONCE — host-committed params as
    # jit args re-upload per call over the tunnel (seconds per rep)
    import jax

    dev = jax.devices()[0]
    hp, lp, h_extra, l_extra, batch_data, hh, lh = jax.device_put(
        (hp, lp, h_extra, l_extra, batch_data, hh, lh), dev
    )
    jax.block_until_ready(hp)
    return (cfg, high, low, hp, lp, h_extra, l_extra, trunk_fn, batch_data,
            hh, lh, opt_lib, steps_lib)


def measure(mode, batch=4, t=50, reps=7):
    import jax
    import jax.numpy as jnp

    (cfg, high, low, hp, lp, h_extra, l_extra, trunk_fn, batch_data,
     hh, lh, opt_lib, steps_lib) = _setup(
        batch, t, raw=mode.startswith("trunk"))

    class _B:
        def __init__(self, policy, extra):
            self._p, self._e = policy, extra

        def apply(self, variables, *args, **kwargs):
            return self._p.apply({**self._e, **variables}, *args, **kwargs)

    bhigh, blow = _B(high, h_extra), _B(low, l_extra)

    import functools

    losses_fn = functools.partial(
        steps_lib._hier_losses, bhigh, blow, trunk_fn=trunk_fn
    )

    def combined_loss(both):
        hl, ll_a, ll_s, _, _, _ = losses_fn(
            both[0], both[1], batch_data, hh, lh, None
        )
        return hl + ll_a + ll_s

    if mode == "step":
        tx_h = opt_lib.masked(opt_lib.adamw(1e-5), hp)
        tx_l = opt_lib.masked(opt_lib.adam(0.0), lp)
        state = steps_lib.HierTrainState(
            steps_lib.TrainState(hp, tx_h.init(hp), jnp.asarray(0)),
            steps_lib.TrainState(lp, tx_l.init(lp), jnp.asarray(0)),
        )
        step = steps_lib.make_hier_train_step(
            bhigh, blow, tx_h, tx_l, None, donate=False, remat=False,
            trunk_fn=trunk_fn,
        )

        def run():
            s2, _, _, m = step(state, hh, lh, batch_data, 1e-4, 1e-4)
            return m["high_level_loss"]

    elif mode == "fwd":
        @jax.jit
        def prog(hp, lp):
            return combined_loss((hp, lp))

        def run():
            return prog(hp, lp)

    elif mode == "high_fwd":
        @jax.jit
        def prog(hp):
            obs = {k: batch_data[k] for k in (
                "instruction", "progress", "rgb_features", "depth_features")}
            logits, _ = bhigh.apply(
                {"params": hp}, obs, hh, batch_data["prev_actions"],
                batch_data["not_done_masks"],
            )
            return jnp.mean(logits.astype(jnp.float32))

        def run():
            return prog(hp)

    elif mode == "low_fwd":
        @jax.jit
        def prog(hp, lp):
            obs = {k: batch_data[k] for k in (
                "instruction", "progress", "rgb_features", "depth_features")}
            disc = jnp.clip(
                batch_data["vln_oracle_action_sensor"].astype(jnp.int32) - 1,
                0, 4,
            )
            a, s, _ = blow.apply(
                {"params": lp}, obs, lh, batch_data["prev_actions"],
                batch_data["not_done_masks"], disc,
            )
            return jnp.mean(a.astype(jnp.float32))

        def run():
            return prog(hp, lp)

    elif mode == "bert":
        @jax.jit
        def prog(hp):
            emb = bhigh._p.apply(
                {**h_extra, "params": hp}, batch_data["instruction"],
                method="embed_instruction",
            )
            return jnp.mean(emb.astype(jnp.float32))

        def run():
            return prog(hp)

    elif mode == "grads":
        gfn = jax.jit(jax.grad(combined_loss))

        def run():
            g = gfn((hp, lp))
            return jax.tree_util.tree_leaves(g)[0].sum()

    elif mode == "grads_drop":
        def loss_drop(both):
            rng = jax.random.fold_in(jax.random.PRNGKey(17), 3)
            hl, ll_a, ll_s, _, _, _ = losses_fn(
                both[0], both[1], batch_data, hh, lh, rng
            )
            return hl + ll_a + ll_s

        gfn = jax.jit(jax.grad(loss_drop))

        def run():
            g = gfn((hp, lp))
            return jax.tree_util.tree_leaves(g)[0].sum()

    elif mode == "grads_nobert":
        emb = jax.jit(
            lambda hp: bhigh._p.apply(
                {**h_extra, "params": hp}, batch_data["instruction"],
                method="embed_instruction",
            )
        )(hp)
        jax.block_until_ready(emb)
        nb_batch = {k: v for k, v in batch_data.items() if k != "instruction"}
        nb_batch["instruction_embedding"] = emb

        def loss_nobert(both):
            hl, ll_a, ll_s, _, _, _ = losses_fn(
                both[0], both[1], nb_batch, hh, lh, None
            )
            return hl + ll_a + ll_s

        gfn = jax.jit(jax.grad(loss_nobert))

        def run():
            g = gfn((hp, lp))
            return jax.tree_util.tree_leaves(g)[0].sum()

    elif mode.startswith("trunk"):
        # frozen conv trunks on raw frames (the raw-step delta vs feature
        # mode; also the eval-tick conv cost).  trunk_rgb / trunk_depth
        # consume one output only — XLA dead-code-eliminates the other trunk.
        want = {"trunks": ("rgb_features", "depth_features"),
                "trunk_rgb": ("rgb_features",),
                "trunk_depth": ("depth_features",)}[mode]

        @jax.jit
        def prog(hp):
            f = trunk_fn(
                hp, {"rgb": batch_data["rgb"], "depth": batch_data["depth"]}
            )
            return sum(jnp.mean(f[k].astype(jnp.float32)) for k in want)

        def run():
            return prog(hp)

    elif mode == "opt":
        tx_h = opt_lib.masked(opt_lib.adamw(1e-5), hp)
        tx_l = opt_lib.masked(opt_lib.adam(0.0), lp)
        hopt0, lopt0 = tx_h.init(hp), tx_l.init(lp)

        @jax.jit
        def prog(hp, lp, hopt, lopt):
            hg = jax.tree.map(jnp.zeros_like, hp)
            lg = jax.tree.map(jnp.zeros_like, lp)
            hu, hopt = opt_lib.apply_updates(tx_h, hg, hopt, hp, 1e-4)
            lu, lopt = opt_lib.apply_updates(tx_l, lg, lopt, lp, 1e-4)
            hp2 = jax.tree.map(lambda p, u: p + u, hp, hu)
            lp2 = jax.tree.map(lambda p, u: p + u, lp, lu)
            return jax.tree_util.tree_leaves(hp2)[0].sum()

        def run():
            return prog(hp, lp, hopt0, lopt0)

    @jax.jit
    def trivial(x):
        return jnp.mean(x)

    m = batch_data["not_done_masks"]
    float(run())
    float(trivial(m))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        ts.append(time.perf_counter() - t0)
    t_prog = min(ts)
    t_0 = min(
        (lambda: (lambda s: (float(trivial(m)), time.perf_counter() - s)[1])(
            time.perf_counter()))()
        for _ in range(reps)
    )
    return {"mode": mode, "ms": round((t_prog - t_0) * 1e3, 3),
            "raw_ms": round(t_prog * 1e3, 3),
            "overhead_ms": round(t_0 * 1e3, 3)}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        import bench

        bench.wait_for_device()
        print(json.dumps(measure(sys.argv[2])))
        return

    results = {}
    for mode in MODES:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", mode],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, timeout=1800,
        )
        out = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if out is None:
            print(f"# {mode} FAILED rc={proc.returncode}: "
                  + proc.stderr[-300:].replace("\n", " | "), file=sys.stderr)
        else:
            results[mode] = out
            print(json.dumps(out), flush=True)
    print(json.dumps({"summary": {k: v["ms"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
