"""Env layer tests: kinematic integrator vs quaternion math, expert follower
semantics, measures (incl. DTW golden values), data collection end-to-end,
nonlearning agents."""

import gzip
import json

import numpy as np
import pytest

from robo_vln_tpu.envs.velocity_control import (
    RigidState,
    VelocityControl,
    heading_from_quaternion,
    integrate_rigid_state,
    track_waypoint_native,
)


def make_episode_json(tmp_path, n_eps=2):
    """Synthetic robo_vln_v1-format dataset file."""
    episodes = []
    for i in range(n_eps):
        path = [[0.0, 0.0, 0.0], [0.0, 0.0, -2.0], [2.0, 0.0, -4.0 - i]]
        episodes.append(
            {
                "episode_id": str(i),
                "scene_id": f"scene_{i % 2}.glb",
                "start_position": path[0],
                "start_rotation": [0, 0, 0, 1],  # identity (x,y,z,w)
                "goals": [{"position": path[-1], "radius": 3.0}],
                "reference_path": path,
                "instruction": {
                    "instruction_text": f"walk forward then turn {i}",
                    "instruction_tokens": [1, 2, 3, 4 + i],
                },
                "info": {"geodesic_distance": 5.0},
            }
        )
    data = {
        "episodes": episodes,
        "instruction_vocab": {"word_list": ["<pad>", "walk", "forward", "turn"]},
    }
    p = tmp_path / "train.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump(data, f)
    return str(p)


def kinematic_config(tmp_path, data_path):
    from robo_vln_tpu.config.default import get_config

    cfg = get_config().clone().defrost()
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.DATASET.SCENES_DIR = str(tmp_path)
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH = 32
    cfg.TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT = 32
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH = 32
    cfg.TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT = 32
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 400
    cfg.DAGGER.LMDB_COMMIT_FREQUENCY = 2
    return cfg


def test_integrator_straight_line():
    """Forward velocity (-z local) with identity rotation moves along -z."""
    state = RigidState()
    vc = VelocityControl(linear_velocity=np.array([0, 0, -1.0]))
    for _ in range(30):
        state = integrate_rigid_state(state, vc, 1.0 / 30)
    np.testing.assert_allclose(state.position, [0, 0, -1.0], atol=1e-9)


def test_integrator_rotation_then_translation_order():
    """Translation uses the PRE-step rotation (habitat integrateTransform)."""
    state = RigidState()
    vc = VelocityControl(
        linear_velocity=np.array([0, 0, -1.0]),
        angular_velocity=np.array([0, np.pi / 2, 0]),
    )
    state = integrate_rigid_state(state, vc, 1.0)
    # translation happened before the 90 deg yaw
    np.testing.assert_allclose(state.position, [0, 0, -1.0], atol=1e-9)
    # heading now rotated by +90 deg around y
    h = heading_from_quaternion(state.rotation)
    np.testing.assert_allclose(abs(h), np.pi / 2, atol=1e-9)


def test_integrator_native_matches_numpy(rng):
    import robo_vln_tpu.envs.velocity_control as vcmod

    q = rng.standard_normal(4)
    q = q / np.linalg.norm(q)
    pos = rng.standard_normal(3)
    lin = rng.standard_normal(3)
    ang = rng.standard_normal(3)
    st = RigidState(q.copy(), pos.copy())
    vc = VelocityControl(lin.copy(), ang.copy())
    out_native = integrate_rigid_state(st, vc, 1 / 30)
    # force the numpy fallback
    saved = vcmod._lib
    vcmod._lib = False
    out_py = integrate_rigid_state(RigidState(q.copy(), pos.copy()), vc, 1 / 30)
    vcmod._lib = saved
    np.testing.assert_allclose(out_native.rotation, out_py.rotation, atol=1e-12)
    np.testing.assert_allclose(out_native.position, out_py.position, atol=1e-12)


def test_track_waypoint_semantics():
    """Aligned -> accelerate toward -1; near goal -> decay; misaligned -> turn."""
    st = RigidState()
    # waypoint straight ahead (on -z)
    v, w = track_waypoint_native(st, np.array([0, 0, -5.0]), 0.0, 0.0, 1 / 30)
    assert v == pytest.approx(-0.5)  # (0 - 1)/2
    assert abs(w) < 1e-6
    # near the end of the path: decay
    v2, _ = track_waypoint_native(st, np.array([0, 0, -5.0]), -0.9, 0.99, 1 / 30)
    assert v2 == pytest.approx(-0.9 / 1.5)
    # waypoint to the left (+x is left of -z heading? reference: rot_dir from
    # glob_right=(-1,0,0)): waypoint at +x -> dot(right,u) < 0 -> rot_dir -1
    v3, w3 = track_waypoint_native(st, np.array([5.0, 0, 0.0]), 0.0, 0.0, 1 / 30)
    assert v3 == pytest.approx(0.0)  # misaligned: 0/2
    assert w3 == pytest.approx(-1.0)  # saturated turn


def test_dtw_matches_known_values():
    from robo_vln_tpu.tasks.dtw import dtw, fastdtw, ndtw

    a = [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]
    b = [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]
    assert dtw(a, b)[0] == pytest.approx(0.0)
    b2 = [[0.0, 1.0], [1.0, 1.0], [2.0, 1.0]]
    assert dtw(a, b2)[0] == pytest.approx(3.0)
    # fastdtw approximates exact dtw on longer paths
    rng = np.random.default_rng(0)
    x = np.cumsum(rng.standard_normal((60, 3)) * 0.1, axis=0)
    y = x + rng.standard_normal((60, 3)) * 0.01
    exact = dtw(x, y)[0]
    approx = fastdtw(x, y)[0]
    assert approx >= exact - 1e-9
    assert approx <= exact * 1.3 + 1e-6
    assert 0 < ndtw(x, y, 3.0) <= 1.0


def test_kinematic_env_and_expert_rollout(tmp_path):
    from robo_vln_tpu.envs.env_utils import construct_env
    from robo_vln_tpu.envs.expert import ContinuousPathFollower, track_waypoint

    cfg = kinematic_config(tmp_path, make_episode_json(tmp_path)).freeze()
    env = construct_env(cfg)
    obs = env.reset()
    assert obs["rgb"].shape == (32, 32, 3)
    assert obs["depth"].shape == (32, 32, 1)
    assert isinstance(obs["instruction"], dict)
    assert 0.0 <= float(obs["progress"][0]) <= 1.0

    ep = env.habitat_env.current_episode
    ref = list(ep.reference_path) + [ep.goals[0].position]
    follower = ContinuousPathFollower(env.habitat_env._sim, ref, 0.4)
    vc_state = None
    from robo_vln_tpu.envs.velocity_control import VelocityControl

    vc = VelocityControl()
    start = env.get_agent_position().copy()
    for _ in range(300):
        follower.update_waypoint()
        if follower.progress >= 1.0:
            break
        track_waypoint(
            follower.waypoint, env.get_agent_state(), vc,
            progress=follower.progress, dt=cfg.DAGGER.time_step,
        )
        obs, _, done, info = env.step(vc)
    # the expert actually progressed along the path
    assert follower.progress > 0.5
    moved = np.linalg.norm(env.get_agent_position() - start)
    assert moved > 1.0
    assert info["path_length"] > 1.0
    env.close()


def test_collection_writes_buffer(tmp_path):
    from robo_vln_tpu.data.loader import TrajectoryDataset
    from robo_vln_tpu.envs.collection import collect_dataset

    cfg = kinematic_config(tmp_path, make_episode_json(tmp_path))
    cfg.DAGGER.UPDATE_SIZE = 2
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = False
    cfg.freeze()
    out = str(tmp_path / "collected")
    n = collect_dataset(cfg, out)
    assert n == 2

    ds = TrajectoryDataset(out, batch_size=1, is_bert=False)
    obs, prev, corr, ostop = next(iter(ds))
    assert corr.shape[1] == 2
    assert len(corr) > 10  # a real rollout, many steps
    assert obs["rgb"].ndim == 4
    assert obs["instruction"].ndim == 1
    # expert velocities drive forward (negative z-convention)
    assert corr[:, 0].min() < -0.3


def test_collection_multiprocess_workers(tmp_path):
    """NUM_PROCESSES>1 collection: spawned worker processes roll out the
    expert in parallel (the reference habitat.VectorEnv fork-server role,
    env_utils.py:117-205) and the master writes one shared buffer."""
    from robo_vln_tpu.data.loader import TrajectoryDataset
    from robo_vln_tpu.envs.collection import collect_dataset

    cfg = kinematic_config(tmp_path, make_episode_json(tmp_path, n_eps=4))
    cfg.DAGGER.UPDATE_SIZE = 4
    cfg.NUM_PROCESSES = 2
    cfg.MODEL.INSTRUCTION_ENCODER.is_bert = False
    cfg.freeze()
    out = str(tmp_path / "collected_mp")
    n = collect_dataset(cfg, out)
    assert n == 4

    ds = TrajectoryDataset(out, batch_size=1, is_bert=False)
    assert ds.length == 4
    for obs, prev, corr, ostop in ds:
        assert corr.shape[1] == 2
        assert len(corr) > 10
        assert corr[:, 0].min() < -0.3  # real expert rollouts in every slot


def test_collect_action_noise_perturbs_execution_not_labels(tmp_path):
    """DAGGER.COLLECT_ACTION_NOISE (DART-style recovery collection): the
    rollout drifts (different observed trajectory) but the recorded labels
    stay the clean expert commands (bounded like the noiseless controller
    output), and episodes still complete."""
    from robo_vln_tpu.envs.collection import collect_dataset
    from robo_vln_tpu.data.loader import TrajectoryDataset

    runs = {}
    for name, noise in (("clean", 0.0), ("noisy", 0.4)):
        cfg = kinematic_config(tmp_path, make_episode_json(tmp_path))
        cfg.MODEL.INSTRUCTION_ENCODER.is_bert = False
        cfg.DAGGER.COLLECT_ACTION_NOISE = noise
        cfg.freeze()
        out = str(tmp_path / f"buf_{name}")
        assert collect_dataset(cfg, out, update_size=2) == 2
        ds = TrajectoryDataset(out, batch_size=1, is_bert=False, seed=1)
        runs[name] = [(dict(o), p.copy(), c.copy()) for o, p, c in
                      ((o, p, c) for o, p, c, _ in ds)]

    by_len = {}
    for name, eps in runs.items():
        for o, p, c in eps:
            by_len.setdefault(name, {})[len(c)] = (o, p, c)
    # labels bounded like clean controller output (no injected noise leaks in)
    for o, p, c in runs["noisy"]:
        assert np.isfinite(c).all()
        assert np.abs(c[:, 1]).max() <= 1.0 + 1e-6  # omega clamp
    # the executed (observed) trajectories differ: compare rgb streams of the
    # same episode (matched by instruction tokens)
    def key(o):
        return tuple(np.asarray(o["instruction"]).reshape(-1)[:8])

    clean = {key(o): o for o, _, _ in runs["clean"]}
    drifted = 0
    for o, _, _ in runs["noisy"]:
        co = clean[key(o)]
        a, b = np.asarray(o["rgb"], np.float32), np.asarray(co["rgb"], np.float32)
        n = min(len(a), len(b))
        if n and not np.array_equal(a[:n], b[:n]):
            drifted += 1
    assert drifted == len(runs["noisy"])


def test_nonlearning_agents(tmp_path):
    from robo_vln_tpu.agents.nonlearning import evaluate_agent

    cfg = kinematic_config(tmp_path, make_episode_json(tmp_path))
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.NONLEARNING.AGENT = "HandcraftedAgent"
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 60
    cfg.freeze()
    import os

    os.chdir(tmp_path)
    stats = evaluate_agent(cfg)
    assert "ndtw" in stats and 0 <= stats["ndtw"] <= 1
    assert "success" in stats


def test_window_stream_propagates_worker_errors():
    """A failing decode/transfer in the prefetch worker must CRASH the
    training loop with the real error, not hang it (VERDICT-round-3 review:
    the old loader swallowed worker exceptions and blocked forever)."""
    import pytest

    from robo_vln_tpu.envs.async_env import window_stream

    def batches():
        yield {"x": 1}
        raise RuntimeError("corrupt episode")

    got = []
    with pytest.raises(RuntimeError, match="corrupt episode"):
        for is_first, w in window_stream(
            batches(), shard_fn=lambda w: w, split_fn=lambda b: [b, b]
        ):
            got.append((is_first, w))
    assert got == [(True, {"x": 1}), (False, {"x": 1})]

    # and a clean stream terminates with batch boundaries intact
    out = list(window_stream(
        iter([{"a": 1}, {"a": 2}]), lambda w: w, lambda b: [b]
    ))
    assert out == [(True, {"a": 1}), (True, {"a": 2})]
