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


def _make_tokenizer(config, vocab_file: str = ""):
    if not config.MODEL.INSTRUCTION_ENCODER.is_bert:
        return None
    vf = vocab_file or config.get("BERT_VOCAB_FILE", "")
    return InstructionTokenizer(
        vf or None, max_len=config.DAGGER.MAX_INSTRUCTION_LEN
    ) if vf else None


def _collection_config(config):
    """Collection runs on the collection split (reference switches
    DATASET.SPLIT to DAGGER.COLLECT_DATA_SPLIT, robo_vln_trainer.py:861-866)."""
    ccfg = config.clone().defrost()
    split = config.DAGGER.get("COLLECT_DATA_SPLIT", "") or \
        config.TASK_CONFIG.DATASET.SPLIT
    ccfg.TASK_CONFIG.DATASET.SPLIT = split
    ccfg.freeze()
    return ccfg


def _collect_episode(env, config, tokenizer, is_bert, vel_control,
                     noise_rng=None, mixer=None, beta=1.0, mix_rng=None):
    """Run ONE expert rollout; returns (obs, prev, corr, stop_steps) or None
    for NaN-invalid trajectories (robo_vln_trainer.py:438-440).

    noise_rng (with DAGGER.COLLECT_ACTION_NOISE > 0): DART-style recovery
    collection — the EXECUTED command is gaussian-perturbed while the
    recorded label stays the expert's clean action, so the buffer contains
    off-manifold states with corrective supervision.

    mixer + beta < 1 (DAGGER.P < 1, envs/dagger.py): per step, execute the
    current POLICY's action with probability 1-beta instead of the expert's
    (true DAgger mixing; labels stay the expert's clean action either way).
    The mixer network is stepped every step so its recurrent state tracks
    the executed history; noise applies only to expert-sourced commands."""
    noise_std = float(config.DAGGER.get("COLLECT_ACTION_NOISE", 0.0) or 0.0)
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
    vel_control.linear_velocity = np.zeros(3)
    vel_control.angular_velocity = np.zeros(3)
    if mixer is not None:
        mixer.reset()
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
            return None
        vel, omega = track_waypoint(
            follower.waypoint, state, vel_control,
            progress=follower.progress, dt=config.DAGGER.time_step,
        )
        exec_v, exec_w = vel, omega
        from_policy = False
        if mixer is not None:
            # stepped unconditionally: the recurrent state must track the
            # executed history, not just the steps where the coin fires
            p_v, p_w = mixer.step(observations)
            if mix_rng is not None and mix_rng.random() >= beta and \
                    np.isfinite(p_v) and np.isfinite(p_w):
                # same clipping as the eval driver (evaluator.py:424)
                exec_v, exec_w = p_v, float(np.clip(p_w, -1.0, 1.0))
                from_policy = True
        if noise_std > 0.0 and noise_rng is not None and not from_policy:
            # perturb the EXECUTED command only (expert-sourced steps; a
            # policy-sourced command is already off the expert manifold)
            n_v, n_w = noise_rng.normal(0.0, noise_std, 2)
            exec_v, exec_w = exec_v + n_v, exec_w + n_w
        if (exec_v, exec_w) != (vel, omega):
            # the label below stays the clean (vel, omega), and the
            # controller's velocity-smoothing memory (prev linear z in
            # vel_control) is restored after the step
            vel_control.linear_velocity = np.array([0.0, 0.0, exec_v])
            vel_control.angular_velocity = np.array([0.0, exec_w, 0.0])
            observations, _, done, _ = env.step(vel_control)
            vel_control.linear_velocity = np.array([0.0, 0.0, vel])
            vel_control.angular_velocity = np.array([0.0, omega, 0.0])
        else:
            observations, _, done, _ = env.step(vel_control)
        if mixer is not None:
            mixer.set_prev(exec_v, exec_w)
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
        episode_steps.append((observations, prev_actions, actions, stop_step))
        prev_actions = actions

    if not episode_steps:
        return None
    traj_obs = batch_obs_data_collect([s[0] for s in episode_steps])
    return (
        traj_obs,
        np.array([s[1][0] for s in episode_steps]),
        np.array([s[2][0] for s in episode_steps]),
        [s[3] for s in episode_steps],
    )


def collect_dataset(config, features_dir: str, env=None,
                    update_size: int = None, vocab_file: str = "",
                    mixer=None, beta: float = 1.0) -> int:
    """Collect expert episodes into `features_dir`. Returns episodes written.

    NUM_PROCESSES > 1 (and no explicit `env`) fans the rollouts out to
    process-based workers (the reference's habitat.VectorEnv fork-server
    role, env_utils.py:117-205) — real simulators hold the GIL in Python
    code, so threads don't scale collection; processes do.

    mixer + beta < 1: DAgger policy-mixed rollouts (envs/dagger.py).  The
    mixer holds a host snapshot of the policy params, so this path is
    serial — worker processes would need param shipping per iteration."""
    update_size = update_size or config.DAGGER.UPDATE_SIZE
    if mixer is not None and beta < 1.0 and env is None \
            and config.NUM_PROCESSES > 1:
        logger.warning(
            "DAgger mixed collection (DAGGER.P < 1) runs serially; ignoring "
            f"NUM_PROCESSES={config.NUM_PROCESSES} for this iteration"
        )
    elif env is None and config.NUM_PROCESSES > 1:
        return _collect_dataset_parallel(
            config, features_dir, update_size, vocab_file
        )
    is_bert = config.MODEL.INSTRUCTION_ENCODER.is_bert
    tokenizer = _make_tokenizer(config, vocab_file)
    own_env = env is None
    if env is None:
        env = construct_env(_collection_config(config))

    vel_control = VelocityControl()
    collected = 0
    store = TrajectoryStore(features_dir, writable=True)
    try:
        start_id = len(store)
        # fold the buffer offset into the seeds: each DAgger iteration (and
        # each restart-grown chunk) samples FRESH perturbations/mixing
        # decisions instead of replaying the iteration-0 stream, which would
        # correlate recovery states across iterations (ADVICE r4)
        noise_rng = np.random.default_rng(config.TASK_CONFIG.SEED + start_id)
        # independent stream: beta=1.0 collection is bit-identical with or
        # without a mixer attached
        mix_rng = np.random.default_rng(
            config.TASK_CONFIG.SEED + 7919 + start_id
        ) if mixer is not None else None
        for _ in range(update_size):
            ep = _collect_episode(env, config, tokenizer, is_bert, vel_control,
                                  noise_rng=noise_rng, mixer=mixer, beta=beta,
                                  mix_rng=mix_rng)
            if ep is not None:
                write_episode(store, start_id + collected, *ep)
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


# ---------------------------------------------------------------------------
# process-based collection workers
# ---------------------------------------------------------------------------

def _collection_worker(config_dict, n_episodes: int, worker_idx: int,
                       num_workers: int, scenes, vocab_file, queue) -> None:
    """Child-process body: build THIS worker's env over a DISJOINT episode
    share — round-robin scene split when content scenes are known (reference
    construct_envs, env_utils.py:117-205), otherwise a round-robin episode
    slice of the dataset — then roll out `n_episodes` expert episodes and
    ship each as packed bytes.  Spawned (not forked): the parent may hold
    initialized JAX/tunnel threads that are not fork-safe; the worker path
    imports no jax."""
    from robo_vln_tpu.config.tree import ConfigTree
    from robo_vln_tpu.data.loader import pack_episode

    config = ConfigTree(config_dict)
    config = _collection_config(config)
    dataset = None
    if scenes:
        config = config.clone().defrost()
        config.TASK_CONFIG.DATASET.CONTENT_SCENES = (
            scenes[worker_idx::num_workers] or scenes
        )
        config.freeze()
    elif config.TASK_CONFIG.SIMULATOR.TYPE == "kinematic":
        # no scene split available: slice the episode list directly so
        # workers never duplicate each other's episodes
        from robo_vln_tpu.data.dataset import VLNCEDatasetV1

        dataset = VLNCEDatasetV1(config=config.TASK_CONFIG.DATASET)
        dataset.episodes = dataset.episodes[worker_idx::num_workers]
    else:
        logger.warning(
            f"collection worker {worker_idx}: no scene split available for "
            f"SIMULATOR.TYPE={config.TASK_CONFIG.SIMULATOR.TYPE!r}; workers "
            "may roll out overlapping episodes — set "
            "TASK_CONFIG.DATASET.CONTENT_SCENES per process"
        )
    is_bert = config.MODEL.INSTRUCTION_ENCODER.is_bert
    tokenizer = _make_tokenizer(config, vocab_file)
    env = construct_env(config, dataset=dataset)
    vel_control = VelocityControl()
    noise_rng = np.random.default_rng(config.TASK_CONFIG.SEED + worker_idx)
    try:
        for _ in range(n_episodes):
            ep = _collect_episode(env, config, tokenizer, is_bert, vel_control,
                                  noise_rng=noise_rng)
            queue.put(pack_episode(*ep) if ep is not None else None)
    finally:
        env.close()


def _collect_dataset_parallel(config, features_dir: str, update_size: int,
                              vocab_file: str = "") -> int:
    import multiprocessing as mp

    n = int(config.NUM_PROCESSES)
    ctx = mp.get_context("spawn")
    queue = ctx.Queue(maxsize=4 * n)
    # scene names come from the episode json itself, so the split works for
    # any backend whose dataset file is readable
    from robo_vln_tpu.data.dataset import VLNCEDatasetV1

    try:
        scenes = VLNCEDatasetV1.get_scenes_to_load(
            _collection_config(config).TASK_CONFIG.DATASET
        )
    except FileNotFoundError:
        scenes = []
    per = [update_size // n + (1 if i < update_size % n else 0)
           for i in range(n)]
    procs = [
        ctx.Process(
            target=_collection_worker,
            args=(config.to_dict(), per[i], i, n, scenes, vocab_file, queue),
            daemon=True,
        )
        for i in range(n) if per[i] > 0
    ]
    for p in procs:
        p.start()
    collected = 0
    store = TrajectoryStore(features_dir, writable=True)
    try:
        import queue as queue_mod

        start_id = len(store)
        for _ in range(update_size):
            while True:
                try:
                    payload = queue.get(timeout=15)
                    break
                except queue_mod.Empty:
                    if not any(p.is_alive() for p in procs) and queue.empty():
                        raise RuntimeError(
                            "collection workers exited before delivering all "
                            f"episodes ({collected}/{update_size} written)"
                        )
            if payload is None:
                continue
            store.put(start_id + collected, payload)
            collected += 1
            if collected % config.DAGGER.LMDB_COMMIT_FREQUENCY == 0:
                store.flush()
        store.flush()
    finally:
        store.close()
        for p in procs:
            p.join(timeout=60)
            if p.is_alive():
                p.terminate()
    logger.info(
        f"collected {collected} expert episodes -> {features_dir} "
        f"({len(procs)} worker processes)"
    )
    return collected
