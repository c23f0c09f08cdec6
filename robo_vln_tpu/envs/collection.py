"""Expert data collection: rollouts -> trajectory buffer.

Host-side equivalent of the reference `_update_dataset`
(robo_vln_trainer.py:387-503): per episode, follow the arc-length reference
path with the waypoint P-controller, step the simulator with velocity control
at 30 Hz, record (observations, prev_action, action, stop_step) and write the
msgpack'd episode to the buffer.  Preserved details:

* stop_step latched when progress > 0.985 (:451-453);
* early termination when the episode ends or success with |vel| < 0.005
  (:455);
* NaN guard drops invalid trajectories (:438-440);
* commit (flush) every LMDB_COMMIT_FREQUENCY episodes (:493-497).

The simulator stays entirely on the host — TPUs never wait on collection
(SURVEY.md §1).
"""

from __future__ import annotations

import numpy as np

from robo_vln_tpu.data.loader import write_episode
from robo_vln_tpu.data.tokenizer import InstructionTokenizer
from robo_vln_tpu.data.trajectory_store import TrajectoryStore
from robo_vln_tpu.envs.env_utils import construct_env
from robo_vln_tpu.envs.expert import ContinuousPathFollower, track_waypoint
from robo_vln_tpu.envs.obs_utils import batch_obs_data_collect, transform_obs
from robo_vln_tpu.envs.velocity_control import VelocityControl
from robo_vln_tpu.utils.logging import logger


def collect_dataset(config, features_dir: str, env=None,
                    update_size: int = None, vocab_file: str = "") -> int:
    """Collect expert episodes into `features_dir`. Returns episodes written."""
    update_size = update_size or config.DAGGER.UPDATE_SIZE
    is_bert = config.MODEL.INSTRUCTION_ENCODER.is_bert
    tokenizer = None
    if is_bert:
        vf = vocab_file or config.get("BERT_VOCAB_FILE", "")
        tokenizer = InstructionTokenizer(
            vf or None, max_len=config.DAGGER.MAX_INSTRUCTION_LEN
        ) if vf else None
    own_env = env is None
    if env is None:
        # collection runs on the collection split (reference switches
        # DATASET.SPLIT to DAGGER.COLLECT_DATA_SPLIT, robo_vln_trainer.py:861-866)
        ccfg = config.clone().defrost()
        split = config.DAGGER.get("COLLECT_DATA_SPLIT", "") or \
            config.TASK_CONFIG.DATASET.SPLIT
        ccfg.TASK_CONFIG.DATASET.SPLIT = split
        ccfg.freeze()
        env = construct_env(ccfg)

    vel_control = VelocityControl()
    collected = 0
    store = TrajectoryStore(features_dir, writable=True)
    try:
        start_id = len(store)
        for _ in range(update_size):
            episode_steps = []
            observations = env.reset()
            observations = transform_obs(
                observations, config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID,
                tokenizer=tokenizer, is_bert=is_bert,
            )
            ref_path = list(env.habitat_env.current_episode.reference_path) + [
                env.habitat_env.current_episode.goals[0].position
            ]
            follower = ContinuousPathFollower(
                env.habitat_env._sim, ref_path, waypoint_threshold=0.4
            )
            prev_actions = np.zeros((1, 2))
            is_done = False
            steps = 0
            stop_step = 0
            stop_flag = False
            valid = True
            vel_control.linear_velocity = np.zeros(3)
            vel_control.angular_velocity = np.zeros(3)
            while follower.progress < 1.0:
                steps += 1
                if is_done:
                    break
                follower.update_waypoint()
                state = env.habitat_env._sim.get_agent_state()
                if (
                    np.isnan(follower.waypoint).any()
                    or np.isnan(state.position).any()
                    or np.isnan(state.rotation).any()
                ):
                    valid = False
                    break
                vel, omega = track_waypoint(
                    follower.waypoint, state, vel_control,
                    progress=follower.progress, dt=config.DAGGER.time_step,
                )
                observations, _, done, _ = env.step(vel_control)
                episode_over, success = done
                if follower.progress > 0.985 and not stop_flag:
                    stop_step = steps
                    stop_flag = True
                is_done = episode_over or (success and abs(vel) < 0.005)
                observations = transform_obs(
                    observations,
                    config.TASK_CONFIG.TASK.INSTRUCTION_SENSOR_UUID,
                    tokenizer=tokenizer, is_bert=is_bert,
                )
                actions = np.asarray([[vel, omega]], np.float64)
                episode_steps.append(
                    (observations, prev_actions, actions, stop_step)
                )
                prev_actions = actions

            if valid and episode_steps:
                traj_obs = batch_obs_data_collect([s[0] for s in episode_steps])
                write_episode(
                    store,
                    start_id + collected,
                    traj_obs,
                    np.array([s[1][0] for s in episode_steps]),
                    np.array([s[2][0] for s in episode_steps]),
                    [s[3] for s in episode_steps],
                )
                collected += 1
                if collected % config.DAGGER.LMDB_COMMIT_FREQUENCY == 0:
                    store.flush()
        store.flush()
    finally:
        store.close()
        if own_env:
            env.close()
    logger.info(f"collected {collected} expert episodes -> {features_dir}")
    return collected
