#!/usr/bin/env python3
"""Closed-loop eval throughput: single-env vs batched (EVAL.NUM_ENVS).

Drives the production tick — full-size HCM policy (shared trunks +
per-episode BERT-embedding cache) alternating with the kinematic C++ sim —
for a fixed number of ticks at NUM_ENVS in {1, 8} and reports env-steps/s.
One measurement per subprocess (the remote-compile service serves ~one
model-sized compile per process, docs/TPU_ENV_NOTES.md).

    python benchmarks/eval_throughput.py            # orchestrates both
    python benchmarks/eval_throughput.py --measure 8
"""

import gzip
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _dataset(tmp):
    eps = []
    for i in range(8):
        path = [[0.0, 0.0, 0.0], [0.0, 0.0, -3.0], [2.0, 0.0, -6.0 - i]]
        eps.append({
            "episode_id": str(i), "scene_id": f"scene_{i % 2}.glb",
            "start_position": path[0], "start_rotation": [0, 0, 0, 1],
            "goals": [{"position": path[-1], "radius": 3.0}],
            "reference_path": path,
            "instruction": {"instruction_text": f"walk {i}",
                            "instruction_tokens": [1, 2, 3 + i]},
            "info": {"geodesic_distance": 7.0},
        })
    p = os.path.join(tmp, "train.json.gz")
    with gzip.open(p, "wt") as f:
        json.dump({"episodes": eps,
                   "instruction_vocab": {"word_list": ["<pad>", "walk"]}}, f)
    return p


def measure(n_envs: int, ticks: int = 60):
    import numpy as np

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.envs.async_env import AsyncEnvPool
    from robo_vln_tpu.envs.env_utils import construct_envs
    from robo_vln_tpu.envs.obs_utils import batch_obs, transform_obs
    from robo_vln_tpu.envs.velocity_control import VelocityControl
    from robo_vln_tpu.models import make_shared_trunk_fn

    dtype = jnp.bfloat16
    (cfg_m, high, low, hparams, lparams, obs_d, masks_d, prev_d, hh, lh) = (
        g._hcm_setup(rgb_hw=224, depth_hw=256, instr_len=200, batch=n_envs,
                     t=1, compute_dtype=dtype)
    )
    lparams = g._sync_frozen_trunks(hparams, lparams)
    trunk_fn = make_shared_trunk_fn(
        cfg_m.MODEL, dtype, {"batch_stats": hparams["batch_stats"]}
    )

    tmp = tempfile.mkdtemp(prefix="eval_tp_")
    cfg = get_config().clone().defrost()
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = _dataset(tmp)
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = 224
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = 224
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = 256
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = 256
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 10_000  # no resets
    cfg.freeze()
    envs = construct_envs(cfg, num_envs=n_envs)
    pool = AsyncEnvPool(envs)

    @jax.jit
    def tick(hparams, lparams, obs, hh, lh, prev, mask):
        obs = {**obs, **trunk_fn(hparams["params"], obs)}
        logits, hh = high.apply(hparams, obs, hh, prev, mask)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low.apply(lparams, obs, lh, prev, mask, pred)
        return actions, stop, hh, lh

    emb = high.apply(hparams, obs_d["instruction"], method="embed_instruction")
    uuid = cfg.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID
    obs_list = pool.reset()

    def assemble(obs_list):
        per = []
        for o in obs_list:
            o = transform_obs(dict(o), uuid, tokenizer=None, is_bert=False)
            o = {k: v for k, v in o.items()
                 if k in ("rgb", "depth", "progress")}
            per.append(batch_obs(o))
        stacked = {
            k: np.concatenate([p[k] for p in per], axis=0) for k in per[0]
        }
        stacked["instruction"] = np.asarray(obs_d["instruction"])
        # hand host arrays to the jitted call directly — the transfer happens
        # inside ONE dispatch instead of one per observation key
        return stacked

    prev = jnp.zeros((n_envs, 2))
    mask = jnp.ones((n_envs,))
    vcs = [VelocityControl() for _ in range(n_envs)]
    obs = assemble(obs_list)
    obs["instruction_embedding"] = emb

    # warm-up: the ONE model-sized compile
    out = tick(hparams, lparams, obs, hh, lh, prev, mask)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ticks):
        actions, stop, hh, lh = tick(hparams, lparams, obs, hh, lh, prev, mask)
        a = np.asarray(actions)
        for i in range(n_envs):
            vcs[i].linear_velocity = np.array([0.0, 0.0, float(a[i, 0])])
            vcs[i].angular_velocity = np.array(
                [0.0, float(np.clip(a[i, 1], -1, 1)), 0.0]
            )
        pool.async_step(vcs)
        results = pool.wait_step()
        obs = assemble([r[0] for r in results])
        obs["instruction_embedding"] = emb
        prev = actions
    dt = time.perf_counter() - t0
    pool.close()
    return {
        "num_envs": n_envs,
        "ticks_per_s": round(ticks / dt, 2),
        "env_steps_per_s": round(ticks * n_envs / dt, 2),
    }


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        from bench import wait_for_device

        wait_for_device()
        print(json.dumps(measure(int(sys.argv[2]))))
        return
    results = []
    for n in (1, 8):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", str(n)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, timeout=3600,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                results.append(json.loads(line))
                break
            except json.JSONDecodeError:
                continue
        else:
            print(f"# NUM_ENVS={n} failed: {proc.stderr[-400:]}",
                  file=sys.stderr)
    for r in results:
        print(json.dumps(r))
    if len(results) == 2:
        print(json.dumps({
            "metric": "batched closed-loop eval speedup (env-steps/s, N=8 vs 1)",
            "value": round(
                results[1]["env_steps_per_s"] / results[0]["env_steps_per_s"], 2
            ),
        }))


if __name__ == "__main__":
    main()
