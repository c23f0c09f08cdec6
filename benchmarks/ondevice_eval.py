#!/usr/bin/env python3
"""On-device closed-loop eval throughput (EVAL.ON_DEVICE) at full size.

Runs the fused whole-rollout program (eval/ondevice.py) — full HCM policy,
224x224/256x256 procedural observations, kinematic integration, polyline
geodesics, termination — for a batch of episodes and reports env-steps/s.
Compare against benchmarks/eval_throughput.py (host loop: 5.5 env-steps/s
single, 20.2 batched through this tunnel).

    python benchmarks/ondevice_eval.py [--episodes 8] [--max-steps 150]
"""

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--max-steps", type=int, default=150)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from bench import wait_for_device
    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.eval import ondevice
    from robo_vln_tpu.models import make_shared_trunk_fn

    wait_for_device()
    dtype = jnp.bfloat16
    (cfg_m, high, low, hparams, lparams, obs_d, masks_d, prev_d, hh0, lh0) = (
        g._hcm_setup(rgb_hw=224, depth_hw=256, instr_len=200,
                     batch=args.episodes, t=1, compute_dtype=dtype)
    )
    lparams = g._sync_frozen_trunks(hparams, lparams)
    trunk_fn = make_shared_trunk_fn(
        cfg_m.MODEL, dtype, {"batch_stats": hparams["batch_stats"]}
    )

    cfg = get_config().clone().defrost()
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = 224
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = 224
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = 256
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = 256
    cfg.freeze()

    def policy_step(params, obs, hidden, prev, mask):
        hp, lp = params
        obs = {**obs, **trunk_fn(hp["params"], obs)}
        logits, hh = high.apply(hp, obs, hidden[0], prev, mask)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low.apply(lp, obs, hidden[1], prev, mask, pred)
        return actions, stop, (hh, lh)

    rollout = ondevice.make_rollout_fn(policy_step, cfg, args.max_steps)

    B = args.episodes
    rng = np.random.default_rng(0)
    episodes = []
    for i in range(B):
        path = [[0.0, 0.0, 0.0], [0.0, 0.0, -3.0], [2.0, 0.0, -8.0 - i]]
        episodes.append(types.SimpleNamespace(
            reference_path=path,
            goals=[types.SimpleNamespace(position=path[-1])],
            start_position=path[0], start_rotation=[0, 0, 0, 1],
            info={"geodesic_distance": 11.0 + i},
        ))
    packed = {k: jnp.asarray(v)
              for k, v in ondevice.pack_episodes(episodes, 4).items()}
    instruction_obs = {
        "instruction": jnp.asarray(obs_d["instruction"]),
        "instruction_embedding": high.apply(
            hparams, obs_d["instruction"], method="embed_instruction"
        ),
    }
    hidden = (hh0, lh0)
    params = (hparams, lparams)

    t0 = time.time()
    result = rollout(params, packed, instruction_obs, hidden)
    jax.block_until_ready(result["positions"])
    compile_and_run = time.time() - t0

    t0 = time.perf_counter()
    result = rollout(params, packed, instruction_obs, hidden)
    jax.block_until_ready(result["positions"])
    dt = time.perf_counter() - t0
    ticks = int(result["n_ticks"])
    env_steps = int(np.asarray(result["steps"]).sum())
    print(json.dumps({
        "metric": "on-device closed-loop eval (EVAL.ON_DEVICE)",
        "episodes": B, "ticks": ticks, "env_steps": env_steps,
        "seconds": round(dt, 3),
        "env_steps_per_s": round(env_steps / dt, 1),
        "ms_per_tick": round(dt / max(ticks, 1) * 1e3, 3),
        "compile_plus_first_run_s": round(compile_and_run, 1),
    }))


if __name__ == "__main__":
    main()
