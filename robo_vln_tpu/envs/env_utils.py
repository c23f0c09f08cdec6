"""Env construction (reference env_utils.construct_env/construct_envs
equivalents, env_utils.py:25-205).

`construct_env` returns ONE env (what the shipped trainers use: all paper
configs set NUM_PROCESSES=1).  `construct_env_pool` is the multi-env analogue
of habitat.VectorEnv: a pool of envs stepped round-robin from worker threads,
feeding the device through a double-buffered queue (envs/async_env.py).
Backend selection comes from TASK_CONFIG.SIMULATOR.TYPE.
"""

from __future__ import annotations

from typing import List, Optional

from robo_vln_tpu.envs.env import HabitatEnv, KinematicEnv, ReplayEnv


def construct_env(config, dataset=None):
    sim_type = config.TASK_CONFIG.SIMULATOR.TYPE
    if sim_type == "kinematic":
        return KinematicEnv(config, dataset=dataset)
    if sim_type == "replay":
        return ReplayEnv(config, config.DAGGER.LMDB_FEATURES_DIR.format(
            split=config.TASK_CONFIG.DATASET.SPLIT
        ))
    if sim_type == "habitat":
        return HabitatEnv(config)
    raise ValueError(f"unknown SIMULATOR.TYPE {sim_type!r}")


def construct_envs(config, dataset=None, num_envs: Optional[int] = None) -> List:
    """Scene-split multi-env construction (reference construct_envs semantics:
    content scenes split round-robin across processes, env_utils.py:117-205).
    Returns a list of envs; wrap with envs.async_env.AsyncEnvPool to overlap
    host sim stepping with device compute."""
    from robo_vln_tpu.data.dataset import VLNCEDatasetV1

    n = num_envs or config.NUM_PROCESSES
    if n <= 1:
        return [construct_env(config, dataset)]

    scenes = []
    if dataset is None and config.TASK_CONFIG.SIMULATOR.TYPE == "kinematic":
        try:
            scenes = VLNCEDatasetV1.get_scenes_to_load(config.TASK_CONFIG.DATASET)
        except FileNotFoundError:
            scenes = []
    envs = []
    for i in range(n):
        sub = config.clone().defrost()
        if scenes:
            sub.TASK_CONFIG.DATASET.CONTENT_SCENES = scenes[i::n] or scenes
        sub.freeze()
        envs.append(construct_env(sub, dataset))
    return envs
