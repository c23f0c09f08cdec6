"""Nonlearning agents + their closed-loop evaluation.

Equivalents of reference nonlearning_agents.py:52-212:
* RandomContinuousAgent — v ~ U[0,2], omega ~ U[-1,1] (:150-165);
* HandcraftedAgent — random heading then 37 forward steps (:191-212), mapped
  onto continuous control (turn at max_turn_speed for the random turn budget,
  then drive forward, then stop);
* evaluate_agent — closed-loop rollout with per-episode nDTW and an aggregated
  stats json (:52-148).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict

import numpy as np

from robo_vln_tpu.envs.env_utils import construct_env
from robo_vln_tpu.envs.expert import ContinuousPathFollower, track_waypoint
from robo_vln_tpu.envs.velocity_control import VelocityControl
from robo_vln_tpu.tasks.dtw import ndtw
from robo_vln_tpu.utils.logging import logger


class RandomContinuousAgent:
    def __init__(self, seed: int = 0):
        self._rng = random.Random(seed)

    def reset(self, env=None):
        pass

    def act(self, env=None):
        vel = self._rng.random() * 2.0
        omega = (self._rng.random() - 0.5) * 2.0
        return (vel, omega)


class HandcraftedAgent:
    """Random heading, then ~9.25 m forward (37 x 0.25 m), then stop —
    expressed as continuous velocities at 30 Hz."""

    def __init__(self, seed: int = 0, dt: float = 1.0 / 30):
        self._rng = np.random.default_rng(seed)
        self._dt = dt
        self.reset()

    def reset(self, env=None):
        turns = int(self._rng.integers(0, int(360 / 15) + 1))
        # each reference turn is 15 deg; at max_turn_speed 1 rad/s
        self._turn_steps = int(np.ceil(turns * np.deg2rad(15) / (1.0 * self._dt)))
        # 37 forward steps x 0.25 m at 1 m/s
        self._fwd_steps = int(np.ceil(37 * 0.25 / (1.0 * self._dt)))

    def act(self, env=None):
        if self._turn_steps > 0:
            self._turn_steps -= 1
            return (0.0, 1.0)
        if self._fwd_steps > 0:
            self._fwd_steps -= 1
            return (1.0, 0.0)
        return (0.0, 0.0)


class ExpertAgent:
    """Replays the collection-time expert (ContinuousPathFollower +
    track_waypoint, envs/expert.py — reference continuous_path_follower.py)
    through the SAME closed-loop eval as every learned policy.

    This is the eval pipeline's soundness upper bound: the expert writes the
    training data, so its closed-loop row bounds what a perfectly-imitating
    policy could score under these measures/thresholds, and any pipeline bug
    (obs/sim/measure mismatch) would show up here first.  The reference has
    no such agent — its expert only runs inside _update_dataset
    (robo_vln_trainer.py:387-503)."""

    def __init__(self, seed: int = 0, dt: float = 1.0 / 30):
        self._dt = dt
        self._follower = None
        self._vc = VelocityControl()

    def reset(self, env=None):
        if env is None:
            return
        ep = env.habitat_env.current_episode
        ref_path = list(ep.reference_path) + [ep.goals[0].position]
        self._follower = ContinuousPathFollower(
            env.habitat_env._sim, ref_path, waypoint_threshold=0.4
        )
        self._vc.linear_velocity = np.zeros(3)
        self._vc.angular_velocity = np.zeros(3)

    def act(self, env=None):
        if env is None or self._follower is None:
            return (0.0, 0.0)
        self._follower.update_waypoint()
        state = env.habitat_env._sim.get_agent_state()
        vel, omega = track_waypoint(
            self._follower.waypoint, state, self._vc,
            progress=self._follower.progress, dt=self._dt,
        )
        # track_waypoint speaks the sim's -z-forward convention (negative =
        # forward); the nonlearning eval driver negates actions[0] (reference
        # nonlearning_agents.py:99), so hand it positive-forward speed
        return (-vel, omega)


def evaluate_agent(config) -> Dict[str, float]:
    split = config.EVAL.SPLIT
    config = config.clone().defrost()
    config.TASK_CONFIG.DATASET.SPLIT = split
    config.TASK_CONFIG.TASK.NDTW.SPLIT = split
    config.TASK_CONFIG.TASK.SDTW.SPLIT = split
    config.freeze()

    env = construct_env(config)
    name = config.EVAL.NONLEARNING.AGENT
    agents = {
        "RandomAgent": RandomContinuousAgent,
        "HandcraftedAgent": HandcraftedAgent,
        "ExpertAgent": ExpertAgent,
    }
    assert name in agents, name
    # the expert must track at the SAME control period the collection expert
    # uses (config.DAGGER.time_step) — the class default 1/30 would misstate
    # the upper-bound row under a different control rate (ADVICE r4)
    kwargs = {"dt": config.DAGGER.time_step} if name == "ExpertAgent" else {}
    agent = agents[name](**kwargs)

    gt_json = {}
    gt_path = config.TASK_CONFIG.TASK.NDTW.GT_PATH.format(split=split)
    if os.path.exists(gt_path):
        import gzip

        with gzip.open(gt_path, "rt") as f:
            gt_json = json.load(f)

    vc = VelocityControl()
    obs = env.reset()
    agent.reset(env)
    steps = 0
    stats_episodes = {}
    locations = []
    sd = config.TASK_CONFIG.TASK.NDTW.SUCCESS_DISTANCE

    from robo_vln_tpu.eval.evaluator import _DuplicateBreaker, _episode_budget

    budget = _episode_budget(config, [env])
    breaker = _DuplicateBreaker("nonlearning eval")
    while len(stats_episodes) < budget:
        ep = env.habitat_env.current_episode
        actions = agent.act(env)
        vc.linear_velocity = np.array([0, 0, -actions[0]])
        vc.angular_velocity = np.array([0, actions[1], 0])
        obs, _, done, info = env.step(vc)
        episode_over, success = done
        episode_success = success and (actions[0] < 0.25)
        is_done = episode_over or episode_success
        steps += 1
        locations.append(list(env.habitat_env._sim.get_agent_position()))

        if is_done or steps == config.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS:
            gt_locations = gt_json.get(str(ep.episode_id), {}).get(
                "locations",
                list(ep.reference_path) + [ep.goals[0].position],
            )
            was_new = ep.episode_id not in stats_episodes
            stats = dict(info)
            stats["ndtw"] = ndtw(locations, gt_locations, sd)
            stats_episodes[ep.episode_id] = stats
            if breaker.record(was_new, len(stats_episodes)):
                break
            locations = []
            steps = 0
            obs = env.reset()
            agent.reset(env)

    env.close()
    aggregated = {}
    for key in next(iter(stats_episodes.values())).keys():
        vals = [v[key] for v in stats_episodes.values() if v[key] is not None]
        aggregated[key] = float(np.mean(vals)) if vals else 0.0
    out_dir = config.EVAL.VAL_LOG_DIR or "."
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"stats_complete_{name}_{split}.json")
    with open(out_path, "w") as f:
        json.dump(aggregated, f, indent=4)
    logger.info(f"nonlearning eval ({name}, {split}): {aggregated}")
    return aggregated
