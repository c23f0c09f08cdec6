"""Closed-loop checkpoint evaluation.

Equivalents of the reference `_eval_checkpoint` loops
(robo_vln_trainer.py:993-1303 and hierarchical_trainer.py:992-1218): 30 Hz
alternation of a single-step jitted policy with a host-side sim step,
per-episode nDTW against GT locations, aggregated stats json + scalars.

Structure for latency: the policy step is ONE jitted program (for HCM: BERT +
all four encoders + both LSTMs + heads — no cuda:0/cuda:1 crossing) with
donated hidden state; the velocity command is the only device->host transfer
per tick.

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
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from robo_vln_tpu.data.tokenizer import InstructionTokenizer
from robo_vln_tpu.envs.env_utils import construct_env
from robo_vln_tpu.envs.obs_utils import batch_obs, transform_obs
from robo_vln_tpu.envs.velocity_control import VelocityControl
from robo_vln_tpu.tasks.dtw import ndtw
from robo_vln_tpu.training import checkpoint as ckpt_lib
from robo_vln_tpu.utils.logging import logger


def _load_gt(config):
    split = config.TASK_CONFIG.DATASET.SPLIT
    path = config.TASK_CONFIG.TASK.NDTW.GT_PATH.format(split=split)
    if os.path.exists(path):
        import gzip

        with gzip.open(path, "rt") as f:
            return json.load(f)
    return {}


def _policy_obs(config, observations, tokenizer, is_bert):
    obs = transform_obs(
        dict(observations), config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID,
        tokenizer=tokenizer, is_bert=is_bert,
    )
    keep = ("rgb", "depth", "instruction", "progress")
    obs = {k: v for k, v in obs.items() if k in keep}
    return batch_obs(obs, pad_instruction_to=config.DAGGER.MAX_INSTRUCTION_LEN)


def _aggregate_and_log(stats_episodes, config, writer, checkpoint_index):
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
    with open(out, "w") as f:
        json.dump(aggregated, f, indent=4)
    logger.info(f"Episodes evaluated: {num}")
    for k, v in aggregated.items():
        logger.info(f"Average episode {k}: {v:.6f}")
        writer.add_scalar(f"eval_{split}_{k}", v, checkpoint_index + 1)
    return aggregated


def _eval_config(trainer, checkpoint_path: str = ""):
    config = trainer.config.clone().defrost()
    if config.EVAL.USE_CKPT_CONFIG and checkpoint_path:
        # restore the training-time config stored with the checkpoint
        # (reference EVAL.USE_CKPT_CONFIG, robo_vln_trainer.py:1008-1011)
        meta = os.path.join(str(checkpoint_path), "framework_metadata.json")
        if os.path.exists(meta):
            with open(meta) as f:
                saved = json.load(f).get("config", {})
            if "MODEL" in saved:
                config.MODEL.merge_dict(saved["MODEL"])
    config.TASK_CONFIG.DATASET.SPLIT = config.EVAL.SPLIT
    config.TASK_CONFIG.TASK.NDTW.SPLIT = config.EVAL.SPLIT
    config.TASK_CONFIG.TASK.SDTW.SPLIT = config.EVAL.SPLIT
    config.freeze()
    return config


def _tokenizer_for(config):
    if not config.MODEL.INSTRUCTION_ENCODER.is_bert:
        return None
    vf = config.get("BERT_VOCAB_FILE", "")
    return InstructionTokenizer(
        vf or None, max_len=config.DAGGER.MAX_INSTRUCTION_LEN
    ) if vf else None


def eval_flat_checkpoint(trainer, checkpoint_path, writer,
                         checkpoint_index: int = 0) -> Dict[str, float]:
    config = _eval_config(trainer, checkpoint_path)
    is_bert = config.MODEL.INSTRUCTION_ENCODER.is_bert
    tokenizer = _tokenizer_for(config)
    gt_json = _load_gt(config)
    env = construct_env(config)

    if trainer.policy is None:
        trainer._setup_policy()
    if checkpoint_path and os.path.exists(str(checkpoint_path)):
        trainer.state = ckpt_lib.load_checkpoint(checkpoint_path, trainer.state)
        logger.info(f"Loaded weights from checkpoint: {checkpoint_path}")
    policy = trainer.policy
    bound = trainer._bound_policy()
    params = trainer.state.params

    @jax.jit
    def policy_step(params, obs, hidden, prev, mask):
        actions, stop, hidden, _ = bound.apply(
            {"params": params}, obs, hidden, prev, mask
        )
        return actions, stop, hidden

    vc = VelocityControl()
    sd = config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE
    observations = env.reset()
    obs = _policy_obs(config, observations, tokenizer, is_bert)
    hidden = policy.initial_hidden(1)
    prev = jnp.zeros((1, 2))
    mask = jnp.zeros((1,))

    stats_episodes = {}
    locations = []
    rgb_frames = []
    steps = 0
    while len(stats_episodes) < config.EVAL.EPISODE_COUNT:
        ep = env.habitat_env.current_episode
        locations.append(list(env.habitat_env._sim.get_agent_position()))
        actions, stop_out, hidden = policy_step(
            params, {k: jnp.asarray(v) for k, v in obs.items()}, hidden, prev,
            mask,
        )
        prev = actions
        mask = jnp.ones((1,))
        a = np.asarray(actions)[0]
        lin_vel = float(a[0])
        vc.linear_velocity = np.array([0.0, 0.0, lin_vel])
        vc.angular_velocity = np.array([0.0, float(np.clip(a[1], -1.0, 1.0)), 0.0])
        observations, _, done, info = env.step(vc)
        episode_over, success = done
        stop_pred = float(np.round(1 / (1 + np.exp(-np.asarray(stop_out)[0, 0]))))
        episode_success = success and (lin_vel < 0.25 or stop_pred == 1)
        steps += 1

        if config.VIDEO_OPTION:
            from robo_vln_tpu.tasks.viz import (
                append_text_to_image, observations_to_image,
            )

            frame = observations_to_image(observations, info)
            rgb_frames.append(
                append_text_to_image(frame, ep.instruction.instruction_text)
            )

        if episode_over or episode_success or (
            steps == config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS
        ):
            gt_locations = gt_json.get(str(ep.episode_id), {}).get(
                "locations", list(ep.reference_path) + [ep.goals[0].position]
            )
            stats = dict(info)
            stats["ndtw"] = ndtw(locations, gt_locations, sd)
            stats["actual_success"] = 1.0 if episode_success else 0.0
            stats_episodes[ep.episode_id] = stats
            if config.VIDEO_OPTION:
                from robo_vln_tpu.tasks.viz import generate_video

                generate_video(
                    list(config.VIDEO_OPTION), config.VIDEO_DIR, rgb_frames,
                    ep.episode_id, checkpoint_index,
                    {"SPL": round(stats.get("spl") or 0.0, 6)}, writer,
                    fps=int(1.0 / config.DAGGER.time_step),
                )
                rgb_frames = []
            locations = []
            steps = 0
            observations = env.reset()
            hidden = policy.initial_hidden(1)
            prev = jnp.zeros((1, 2))
            mask = jnp.zeros((1,))
        obs = _policy_obs(config, observations, tokenizer, is_bert)

    env.close()
    return _aggregate_and_log(stats_episodes, config, writer, checkpoint_index)


def eval_hierarchical_checkpoint(trainer, checkpoint_path, writer,
                                 checkpoint_index: int = 0) -> Dict[str, float]:
    config = _eval_config(trainer, checkpoint_path)
    is_bert = config.MODEL.INSTRUCTION_ENCODER.is_bert
    tokenizer = _tokenizer_for(config)
    gt_json = _load_gt(config)
    env = construct_env(config)

    if trainer.high is None:
        trainer._setup_policy()
    if checkpoint_path and os.path.exists(str(checkpoint_path)):
        trainer.state = ckpt_lib.load_checkpoint(checkpoint_path, trainer.state)
        logger.info(f"Loaded weights from checkpoint: {checkpoint_path}")
    high, low = trainer.high, trainer.low
    from robo_vln_tpu.training.hierarchical_trainer import _bind

    high_b = _bind(high, trainer._high_extra)
    low_b = _bind(low, trainer._low_extra)

    @jax.jit
    def policy_step(hp, lp, obs, hh, lh, prev, mask):
        logits, hh = high_b.apply({"params": hp}, obs, hh, prev, mask)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low_b.apply(
            {"params": lp}, obs, lh, prev, mask, pred
        )
        return actions, stop, hh, lh

    vc = VelocityControl()
    sd = config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE
    observations = env.reset()
    obs = _policy_obs(config, observations, tokenizer, is_bert)
    hh = high.initial_hidden(1)
    lh = low.initial_hidden(1)
    prev = jnp.zeros((1, 2))
    mask = jnp.zeros((1,))

    stats_episodes = {}
    locations = []
    rgb_frames = []
    steps = 0
    while len(stats_episodes) < config.EVAL.EPISODE_COUNT:
        ep = env.habitat_env.current_episode
        locations.append(list(env.habitat_env._sim.get_agent_position()))
        actions, stop_out, hh, lh = policy_step(
            trainer.state.high.params, trainer.state.low.params,
            {k: jnp.asarray(v) for k, v in obs.items()}, hh, lh, prev, mask,
        )
        prev = actions
        mask = jnp.ones((1,))
        a = np.asarray(actions)[0]
        lin_vel = float(a[0])
        vc.linear_velocity = np.array([0.0, 0.0, lin_vel])
        vc.angular_velocity = np.array([0.0, float(np.clip(a[1], -1.0, 1.0)), 0.0])
        observations, _, done, info = env.step(vc)
        episode_over, success = done
        stop_pred = float(np.round(1 / (1 + np.exp(-np.asarray(stop_out)[0, 0]))))
        episode_success = success and (lin_vel < 0.25 or stop_pred == 1)
        steps += 1

        if config.VIDEO_OPTION:
            from robo_vln_tpu.tasks.viz import (
                append_text_to_image, observations_to_image,
            )

            frame = observations_to_image(observations, info)
            rgb_frames.append(
                append_text_to_image(frame, ep.instruction.instruction_text)
            )

        if episode_over or episode_success or (
            steps == config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS
        ):
            gt_locations = gt_json.get(str(ep.episode_id), {}).get(
                "locations", list(ep.reference_path) + [ep.goals[0].position]
            )
            stats = dict(info)
            stats["ndtw"] = ndtw(locations, gt_locations, sd)
            stats["actual_success"] = 1.0 if episode_success else 0.0
            stats_episodes[ep.episode_id] = stats
            if config.VIDEO_OPTION:
                from robo_vln_tpu.tasks.viz import generate_video

                generate_video(
                    list(config.VIDEO_OPTION), config.VIDEO_DIR, rgb_frames,
                    ep.episode_id, checkpoint_index,
                    {"SPL": round(stats.get("spl") or 0.0, 6)}, writer,
                    fps=int(1.0 / config.DAGGER.time_step),
                )
                rgb_frames = []
            locations = []
            steps = 0
            observations = env.reset()
            hh = high.initial_hidden(1)
            lh = low.initial_hidden(1)
            prev = jnp.zeros((1, 2))
            mask = jnp.zeros((1,))
        obs = _policy_obs(config, observations, tokenizer, is_bert)

    env.close()
    return _aggregate_and_log(stats_episodes, config, writer, checkpoint_index)
