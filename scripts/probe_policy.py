"""Diagnostic: open-loop replay of a trained checkpoint on RECORDED expert
episodes (round-4 closed-loop triage).

Feeds the policy the exact observations/prev-actions the expert saw (from the
training buffer), stepping T=1 at a time through the SAME program shape the
closed-loop evaluator uses, and prints per-step predicted vs expert
velocities and predicted vs oracle sub-goals.  Distinguishes:

* predictions track the expert on expert states -> closed-loop failure is
  distribution shift / error compounding (a learning-scale problem);
* predictions are wrong ON the expert's own states -> train/eval mechanics
  mismatch (a framework bug).

Usage: CS_MODEL=hcm python scripts/probe_policy.py STUDY_OUT_DIR [CKPT_NAME]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1]
CKPT = sys.argv[2] if len(sys.argv) > 2 else None
N_EPISODES = int(os.environ.get("PROBE_EPISODES", 2))
PRINT_STEPS = int(os.environ.get("PROBE_PRINT_STEPS", 24))


def main():
    os.environ.setdefault("CS_STAGE", "probe")  # stop the study orchestrator
    sys.argv = [sys.argv[0], OUT]
    import scripts.convergence_study as cs

    import jax
    import jax.numpy as jnp

    from robo_vln_tpu.data.loader import TrajectoryDataset
    from robo_vln_tpu.eval import evaluator as ev
    from robo_vln_tpu.training.hierarchical_trainer import _bind

    cfg = cs.build_config(cs.data_dir())
    trainer = cs.trainer_class()(cfg)
    names = cs.ckpt_names()
    ckpt = CKPT or (names[-1] if names else None)
    assert ckpt, f"no checkpoints under {OUT}/ckpts"
    path = os.path.join(OUT, "ckpts", ckpt)

    if trainer.high is None:
        trainer._setup_policy()
    ev._load_eval_weights(trainer, path, kind="hierarchical")

    high_b = _bind(trainer.high, trainer._high_extra)
    low_b = _bind(trainer.low, trainer._low_extra)
    trunk_fn = trainer._maybe_trunk_fn()

    @jax.jit
    def embed(hp, ids):
        return high_b.apply({"params": hp}, ids, method="embed_instruction")

    @jax.jit
    def step_fn(hp, lp, obs, hh, lh, prev, mask):
        if trunk_fn is not None:
            obs = {**obs, **trunk_fn(hp, obs)}
        logits, hh = high_b.apply({"params": hp}, obs, hh, prev, mask)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low_b.apply({"params": lp}, obs, lh, prev, mask, pred)
        return actions, stop, pred, hh, lh

    ds = TrajectoryDataset(
        cfg.DAGGER.LMDB_FEATURES_DIR, batch_size=1,
        is_bert=cfg.MODEL.INSTRUCTION_ENCODER.is_bert,
        indices=list(range(N_EPISODES)),
    )
    hp, lp = trainer.state.high.params, trainer.state.low.params
    maxlen = cfg.DAGGER.MAX_INSTRUCTION_LEN

    for ep_i, (obs_seq, prev_seq, corr_seq, ostop) in enumerate(ds):
        t_len = len(prev_seq)
        ids = np.zeros((1, maxlen), np.float32)
        # loader contract: instruction is a single (L,) row per episode
        row = np.asarray(obs_seq["instruction"]).reshape(-1)
        ids[0, : min(len(row), maxlen)] = row[:maxlen]
        emb = embed(hp, jnp.asarray(ids))

        hh = trainer.high.initial_hidden(1)
        lh = trainer.low.initial_hidden(1)
        oracle = np.asarray(obs_seq["vln_oracle_action_sensor"]).reshape(-1)
        errs, hits, tot = [], 0, 0
        print(f"\n=== episode {ep_i} (T={t_len}) ===")
        print(" t | pred_v pred_w | exp_v exp_w | hl oracle")
        for t in range(t_len):
            obs = {
                "rgb": jnp.asarray(obs_seq["rgb"][t][None]),
                "depth": jnp.asarray(obs_seq["depth"][t][None]),
                "instruction": jnp.asarray(ids),
                "progress": jnp.asarray(
                    np.asarray(obs_seq["progress"][t], np.float32).reshape(1, -1)
                ),
                "instruction_embedding": emb,
            }
            prev = jnp.asarray(prev_seq[t].reshape(1, 2), jnp.float32)
            mask = jnp.asarray([0.0 if t == 0 else 1.0], jnp.float32)
            actions, stop, pred, hh, lh = step_fn(hp, lp, obs, hh, lh, prev, mask)
            a = np.asarray(actions).reshape(-1)
            e = corr_seq[t]
            hl = int(np.asarray(pred).reshape(-1)[0])
            orc = int(oracle[t]) - 1
            errs.append(((a[0] - e[0]) ** 2 + (a[1] - e[1]) ** 2) / 2)
            if orc >= 0:
                tot += 1
                hits += int(hl == orc)
            if t < PRINT_STEPS or t % 50 == 0 or t >= t_len - 3:
                print(f"{t:3d} | {a[0]: .3f} {a[1]: .3f} | "
                      f"{e[0]: .3f} {e[1]: .3f} | {hl} {orc}")
        print(f"episode {ep_i}: open-loop velocity MSE {np.mean(errs):.4f} "
              f"(first25 {np.mean(errs[:25]):.4f}), "
              f"HL acc {hits}/{tot} = {hits / max(tot, 1):.3f}")


if __name__ == "__main__":
    main()
