"""On-device closed-loop evaluation for the kinematic backend
(EVAL.ON_DEVICE).

The reference architecture keeps the simulator on the host and pays a
host<->device round trip per 30 Hz control tick (robo_vln_trainer.py:993-1303).
For the RENDERLESS kinematic backend every piece of the loop is pure math —
velocity integration (quaternion), procedural observations, polyline
geodesics, termination logic — so the WHOLE rollout runs as one jitted XLA
program: a `lax.while_loop` over control ticks that early-exits when every
episode in the batch is done.  Per episode batch there is ONE host->device
transfer (episode arrays) and ONE device->host transfer (the position traces
+ termination flags); metrics (nDTW/SPL/...) are computed host-side from the
traces exactly like the host driver.

This is a FAST PATH, not the parity path: it mirrors the host kinematic env
(envs/env.py KinematicEnv, envs/velocity_control.py) in float32 on device —
bit-level trajectory equality with the float64 host sim is not guaranteed
(closed-loop divergence), so the host driver remains the reference-faithful
default.  Math-level parity of every ported piece (integration, geodesics,
render) is pinned in tests/test_ondevice.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# jnp ports of the host sim math (sources cited per function)
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    """(w,x,y,z) Hamilton product (envs/velocity_control.py:_quat_mul)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4) wxyz."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def integrate_rigid_state(q, p, lin, ang, dt):
    """habitat VelocityControl.integrate_transform semantics: translate with
    the PRE-step rotation, then rotate (envs/velocity_control.py:88-118)."""
    p_new = p + quat_rotate(q, lin * dt)
    w = ang * dt
    angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
    safe = jnp.maximum(angle, 1e-12)
    axis = w / safe
    half = angle / 2.0
    dq = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    q_new = quat_mul(q, dq)
    q_new = q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)
    q_new = jnp.where(angle > 1e-12, q_new, q)
    return q_new, p_new


def heading_from_quaternion(q):
    """Yaw of the -z forward vector (envs/velocity_control.py:168-171)."""
    fwd = quat_rotate(q, jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], q.dtype), q.shape[:-1] + (3,)
    ))
    return jnp.arctan2(-fwd[..., 0], -fwd[..., 2])


def polyline_distance(points, cum, p, goal):
    """Polyline geodesic oracle (envs/env.py:_PolylineGeodesics.distance):
    |Δ arc position| + both perpendicular offsets.  points (B, K, 3) padded
    by repeating the goal (zero-length tail segments are inert), cum (B, K).
    """
    def project(x):  # x (B, 3) -> (s, d)
        a = points[:, :-1]            # (B, K-1, 3)
        b = points[:, 1:]
        ab = b - a
        l2 = jnp.sum(ab * ab, axis=-1)                        # (B, K-1)
        ap = x[:, None, :] - a
        t = jnp.where(l2 > 0, jnp.sum(ap * ab, axis=-1) / jnp.maximum(l2, 1e-12), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        proj = a + t[..., None] * ab
        d = jnp.linalg.norm(x[:, None, :] - proj, axis=-1)    # (B, K-1)
        seg_len = jnp.sqrt(l2)
        s_at = cum[:, :-1] + t * seg_len
        best = jnp.argmin(d, axis=-1)                         # (B,)
        take = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
        return take(s_at), take(d)

    sa, da = project(p)
    sb, db = project(goal)
    return jnp.abs(sb - sa) + da + db


def render_obs(pos, heading, rgb_hw, depth_hw):
    """Procedural observations keyed by agent pose — the jnp port of the host
    render (envs/env.py:178-198), vectorized over the batch."""
    h, w = rgb_hw
    yy = jnp.linspace(0.0, 1.0, h, dtype=jnp.float32)[None, :, None]
    xx = jnp.linspace(0.0, 1.0, w, dtype=jnp.float32)[None, None, :]
    base = (
        jnp.sin(xx * 7 + pos[:, 0:1, None])
        + jnp.cos(yy * 5 + pos[:, 2:3, None])
        + jnp.sin(heading)[:, None, None]
    )  # (B, h, w)
    rgb = jnp.stack(
        [base, jnp.roll(base, h // 7, axis=1),
         jnp.swapaxes(base, 1, 2)[:, :h, :w]],
        axis=-1,
    )
    lo = jnp.min(rgb, axis=(1, 2, 3), keepdims=True)
    ptp = jnp.max(rgb, axis=(1, 2, 3), keepdims=True) - lo
    rgb = ((rgb - lo) / (ptp + 1e-6) * 255).astype(jnp.uint8)

    dh, dw = depth_hw
    dyy = jnp.linspace(0.0, 1.0, dh, dtype=jnp.float32)[None, :, None]
    dxx = jnp.linspace(0.0, 1.0, dw, dtype=jnp.float32)[None, None, :]
    depth = jnp.abs(
        jnp.sin(dxx * 3 + heading[:, None, None])
        * jnp.cos(dyy * 4 + pos[:, 0:1, None])
    )[..., None].astype(jnp.float16)
    return rgb, depth


# ---------------------------------------------------------------------------
# the fused rollout program
# ---------------------------------------------------------------------------

def make_rollout_fn(policy_step, config, max_steps: int):
    """Build the jitted whole-rollout program.

    policy_step(params, obs_dict, hidden, prev, mask) ->
        (actions (B,2), stop_logit (B,1), hidden)
    obs_dict carries rgb/depth/instruction(+embedding)/progress in the same
    single-step shapes the host evaluator uses.

    Episode arrays: ref_points (B,K,3) float32 padded by repeating the goal,
    cum (B,K) arc positions, start_pos (B,3), start_rot (B,4) wxyz,
    start_geo (B,) dataset geodesic (SPL convention), plus the instruction
    payloads the policy needs.

    Returns (positions (T,B,3), dones (B,), steps (B,), actual_success (B,),
    n_ticks) — positions beyond an episode's done tick repeat its final pose.
    """
    tc = config.TASK_CONFIG
    rgb_hw = (tc.SIMULATOR.RGB_SENSOR.HEIGHT, tc.SIMULATOR.RGB_SENSOR.WIDTH)
    depth_hw = (tc.SIMULATOR.DEPTH_SENSOR.HEIGHT, tc.SIMULATOR.DEPTH_SENSOR.WIDTH)
    sd = tc.TASK.SUCCESS_DISTANCE
    dt = config.DAGGER.time_step

    def rollout(params, episode, instruction_obs, hidden):
        B = episode["start_pos"].shape[0]
        goal = episode["ref_points"][:, -1]
        traces = jnp.zeros((max_steps, B, 3), jnp.float32)

        def obs_for(p, q, d_goal):
            rgb, depth = render_obs(p, heading_from_quaternion(q), rgb_hw, depth_hw)
            progress = (episode["start_geo"] - d_goal) / episode["start_geo"]
            return {
                "rgb": rgb, "depth": depth, "progress": progress[:, None],
                **instruction_obs,
            }

        def cond(carry):
            t, done = carry[0], carry[5]
            return jnp.logical_and(t < max_steps, ~jnp.all(done))

        def body(carry):
            (t, q, p, hidden, prev, done, steps, succ, traces) = carry
            d_goal = polyline_distance(
                episode["ref_points"], episode["cum"], p, goal
            )
            mask = (t > 0).astype(jnp.float32) * jnp.ones((B,), jnp.float32)
            actions, stop, new_hidden = policy_step(
                params, obs_for(p, q, d_goal), hidden, prev, mask
            )
            lin = actions[:, 0]
            om = jnp.clip(actions[:, 1], -1.0, 1.0)
            lin3 = jnp.stack([jnp.zeros_like(lin), jnp.zeros_like(lin), lin], -1)
            om3 = jnp.stack([jnp.zeros_like(om), om, jnp.zeros_like(om)], -1)
            q2, p2 = integrate_rigid_state(q, p, lin3, om3, dt)
            # freeze finished episodes
            q = jnp.where(done[:, None], q, q2)
            p = jnp.where(done[:, None], p, p2)
            hidden = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((1, B) + (1,) * (new.ndim - 2)), old, new
                ),
                new_hidden, hidden,
            )
            prev = jnp.where(done[:, None], prev, actions)
            # termination (host loop semantics, eval/evaluator.py:265-267):
            # success measured on the POST-step position; actual_success
            # additionally gates on raw lin vel / predicted stop
            d_after = polyline_distance(
                episode["ref_points"], episode["cum"], p, goal
            )
            success = d_after < sd
            stop_pred = jnp.round(jax.nn.sigmoid(stop[:, 0]))
            ep_success = jnp.logical_and(
                success, jnp.logical_or(lin < 0.25, stop_pred == 1)
            )
            newly_done = jnp.logical_and(~done, ep_success)
            steps = steps + (~done).astype(jnp.int32)
            succ = jnp.logical_or(succ, newly_done)
            done = jnp.logical_or(done, ep_success)
            traces = traces.at[t].set(p)
            return (t + 1, q, p, hidden, prev, done, steps, succ, traces)

        init = (
            jnp.asarray(0),
            episode["start_rot"].astype(jnp.float32),
            episode["start_pos"].astype(jnp.float32),
            hidden,
            jnp.zeros((B, 2), jnp.float32),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool),
            traces,
        )
        t, q, p, hidden, prev, done, steps, succ, traces = jax.lax.while_loop(
            cond, body, init
        )
        return {
            "positions": traces, "done": done, "steps": steps,
            "actual_success": succ, "n_ticks": t, "final_pos": p,
        }

    return jax.jit(rollout)


# ---------------------------------------------------------------------------
# host driver: episodes -> batches -> device rollout -> measures
# ---------------------------------------------------------------------------

def pack_episodes(episodes, k_points: int):
    """Pad each episode's reference polyline (+ goal) to `k_points` by
    repeating the goal; precompute cumulative arc positions."""
    B = len(episodes)
    pts = np.zeros((B, k_points, 3), np.float32)
    for i, ep in enumerate(episodes):
        ref = [list(p) for p in ep.reference_path] + [list(ep.goals[0].position)]
        ref = ref[:k_points]
        pts[i, : len(ref)] = np.asarray(ref, np.float32)
        pts[i, len(ref):] = pts[i, len(ref) - 1]
    seg = np.linalg.norm(pts[:, 1:] - pts[:, :-1], axis=-1)
    cum = np.concatenate([np.zeros((B, 1), np.float32), np.cumsum(seg, axis=1)], axis=1)
    start_pos = np.asarray([ep.start_position for ep in episodes], np.float32)
    from robo_vln_tpu.envs.env import habitat_rotation_to_wxyz

    start_rot = np.asarray(
        [habitat_rotation_to_wxyz(ep.start_rotation) for ep in episodes],
        np.float32,
    )
    start_geo = np.asarray(
        [float(ep.info.get("geodesic_distance") or cum[i, -1] or 1.0)
         for i, ep in enumerate(episodes)],
        np.float32,
    )
    return {
        "ref_points": pts, "cum": cum, "start_pos": start_pos,
        "start_rot": start_rot, "start_geo": start_geo,
    }


def episode_stats(result: Dict, episode, i: int, gt_json, sd: float) -> Dict:
    """Host-side measures from the device trace — same formulas as
    tasks/measures.py on the polyline oracle."""
    from robo_vln_tpu.tasks.dtw import ndtw

    steps = int(result["steps"][i])
    trace = np.asarray(result["positions"][:max(steps, 1), i])
    locations = [list(np.asarray(episode.start_position, np.float64))] + [
        list(map(float, p)) for p in trace
    ]
    path_length = float(
        np.linalg.norm(np.diff(np.asarray(locations), axis=0), axis=1).sum()
    )
    goal = np.asarray(episode.goals[0].position, np.float64)
    ref = np.asarray(
        [list(p) for p in episode.reference_path] + [list(goal)], np.float64
    )
    from robo_vln_tpu.envs.env import _PolylineGeodesics

    geo = _PolylineGeodesics(ref)
    final = np.asarray(result["final_pos"][i], np.float64)
    d_goal = geo.distance(final, goal)
    success = float(d_goal < sd)
    start_geo = float(episode.info.get("geodesic_distance") or geo.total or 1.0)
    gt_locations = gt_json.get(str(episode.episode_id), {}).get(
        "locations", [list(p) for p in ref]
    )
    return {
        "distance_to_goal": float(d_goal),
        "navigation_error": float(d_goal),
        "success": success,
        "spl": success * start_geo / max(start_geo, path_length, 1e-8),
        "path_length": path_length,
        "steps_taken": float(steps),
        "ndtw": ndtw(locations, gt_locations, sd),
        "actual_success": float(bool(result["actual_success"][i])),
    }
