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
  BEFORE the round-3 fixes:
    step 35.97 | fwd 5.82 | bert 4.27 | grads 16.39 | grads_drop 29.83 |
    grads_nobert 14.26 | opt 4.40 | high_fwd 1.16 | low_fwd ~0 ms
    -> threefry dropout bits 13.4 ms (37%%), frozen BERT 4.3 of the 5.8 ms
       forward, frozen-leaf p+0 writes ~3 ms.
  AFTER (rbg dropout + frozen passthrough + BERT feature rows):
    step 23.42 ms -> 8806 f/s at B=4 (13541 at B=16, 15468 at B=32).
  Backward localization of the remaining step:
    high_grads 8.69 (high CE fwd+bwd, BERT precomputed, no dropout),
    attn_grads 5.47 (the VisualLingAttn pair alone at exact shapes)
    -> the cross-modal attention block is the dominant remaining cost at
       ~36%% MXU (vs ~93 TF/s forward); its pallas rewrite already lost to
       XLA at these shapes (r2, ops/pallas_attention.py), so this is the
       stopping point — the residue amortizes at B>=16 anyway.

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
         "trunks", "trunk_rgb", "trunk_depth",
         "high_grads", "attn_grads"]


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

    elif mode == "high_grads":
        # backward localization: grad of the high-level CE alone, BERT
        # precomputed, no dropout — isolates the trainable-stack backward
        emb = jax.jit(
            lambda hp: bhigh._p.apply(
                {**h_extra, "params": hp}, batch_data["instruction"],
                method="embed_instruction",
            )
        )(hp)
        jax.block_until_ready(emb)

        def loss_high(hp):
            obs = {k: batch_data[k] for k in (
                "progress", "rgb_features", "depth_features")}
            obs["instruction_embedding"] = emb
            logits, _ = bhigh.apply(
                {"params": hp}, obs, hh, batch_data["prev_actions"],
                batch_data["not_done_masks"],
            )
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss_high))

        def run():
            g = gfn(hp)
            return jax.tree_util.tree_leaves(g)[0].sum()

    elif mode == "attn_grads":
        # the cross-modal attention pair alone (fwd+bwd), at the step's
        # exact shapes: queries (N=B*T, L, 768)-projected, rgb kv 16 tokens,
        # depth kv 64 tokens, d_model 256, 1 layer
        from robo_vln_tpu.models.transformer import VisualLingAttn

        va = cfg.MODEL.VISUAL_LING_ATTN
        attn = VisualLingAttn(
            d_model=va.d_model, h=va.h, d_ff=va.d_ff, n_layers=va.N,
            vis_in_features=va.vis_in_features,
            ins_in_features=va.ins_in_features, dropout=va.dropout,
            compute_dtype=jnp.bfloat16,
        )
        n = batch_data["not_done_masks"].shape[0] * \
            batch_data["not_done_masks"].shape[1]
        rng2 = np.random.default_rng(3)
        emb = jnp.asarray(rng2.standard_normal((n, 200, 768)), jnp.bfloat16)
        rgb_kv = jnp.asarray(rng2.standard_normal((n, 16, 256)), jnp.bfloat16)
        depth_kv = jnp.asarray(
            rng2.standard_normal((n, 64, 256)), jnp.bfloat16
        )
        avars = attn.init(jax.random.PRNGKey(0), emb[:2], rgb_kv[:2])
        emb, rgb_kv, depth_kv, avars = jax.device_put(
            (emb, rgb_kv, depth_kv, avars), jax.devices()[0]
        )

        def loss_attn(avars):
            a = attn.apply(avars, emb, rgb_kv)
            b = attn.apply(avars, emb, depth_kv)
            return (jnp.mean(a.astype(jnp.float32) ** 2)
                    + jnp.mean(b.astype(jnp.float32) ** 2))

        gfn = jax.jit(jax.grad(loss_attn))

        def run():
            g = gfn(avars)
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
