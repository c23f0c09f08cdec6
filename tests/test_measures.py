"""Measure-level pins, including the kinematic-backend geodesic caveat
(docs/PARITY.md): the polyline geodesic oracle is deliberately pessimistic
for off-path agents, so kinematic-backend SPL is relative-only."""

import types

import numpy as np
import pytest

from robo_vln_tpu.envs.env import _PolylineGeodesics
from robo_vln_tpu.tasks.measures import SPL, Success


class _Sim:
    def __init__(self, path):
        self._geo = _PolylineGeodesics(np.asarray(path, np.float64))
        self.pos = np.asarray(path[0], np.float64)

    def get_agent_position(self):
        return self.pos

    def geodesic_distance(self, a, b):
        return self._geo.distance(a, b)


def _episode(goal, start_geo=None):
    ep = types.SimpleNamespace()
    ep.goals = [types.SimpleNamespace(position=list(goal))]
    ep.info = {} if start_geo is None else {"geodesic_distance": start_geo}
    return ep


def test_spl_offpath_kinematic_geodesic():
    """PINS current behavior (docs/PARITY.md caveat): the polyline geodesic
    for an off-path point EXCEEDS the straight-line distance — arc delta plus
    BOTH perpendicular offsets — deflating kinematic-backend SPL/success
    nonuniformly vs navmesh geodesics.  Not paper-comparable; relative-only."""
    path = [[0.0, 0.0, 0.0], [0.0, 0.0, -6.0]]
    sim = _Sim(path)
    goal = [0.0, 0.0, -6.0]

    # 2 m abeam of the path start: polyline distance = 2 (offset) + 6 (arc)
    off = [2.0, 0.0, 0.0]
    d_poly = sim.geodesic_distance(off, goal)
    d_euclid = float(np.linalg.norm(np.asarray(goal) - np.asarray(off)))
    assert d_poly == pytest.approx(8.0)
    assert d_poly > d_euclid  # the pinned pessimism (navmesh would be ~6.32)

    # success gate uses the same pessimistic oracle: 2.9 m abeam of the goal
    # passes (2.9 < 3.0) but 2.9 m abeam MID-path does not (2.9 + 3.0 arc)
    cfg = types.SimpleNamespace(SUCCESS_DISTANCE=3.0)
    success = Success(sim, cfg)
    ep = _episode(goal)
    success.reset_metric(ep)
    sim.pos = np.array([2.9, 0.0, -6.0])
    success.update_metric(ep)
    assert success.metric == 1.0
    sim.pos = np.array([2.9, 0.0, -3.0])
    success.update_metric(ep)
    assert success.metric == 0.0  # euclidean distance 4.17 -> poly 2.9+3.0

    # SPL: dataset-provided start geodesic (habitat convention) + success via
    # the polyline oracle; walking the path exactly gives SPL ~ start/walked
    spl = SPL(sim, cfg)
    sim.pos = np.asarray(path[0], np.float64)
    ep = _episode(goal, start_geo=6.0)
    spl.reset_metric(ep)
    for z in np.linspace(0.0, -6.0, 13)[1:]:
        sim.pos = np.array([0.0, 0.0, z])
        spl.update_metric(ep)
    assert spl.metric == pytest.approx(1.0)

    # an off-path detour shrinks SPL by the extra walked distance
    spl.reset_metric(_episode(goal, start_geo=6.0))
    sim.pos = np.asarray(path[0], np.float64)
    spl2 = SPL(sim, cfg)
    spl2.reset_metric(_episode(goal, start_geo=6.0))
    for p in ([2.0, 0.0, -1.0], [2.0, 0.0, -4.0], [0.0, 0.0, -6.0]):
        sim.pos = np.asarray(p)
        spl2.update_metric(_episode(goal, start_geo=6.0))
    assert 0.0 < spl2.metric < 1.0
