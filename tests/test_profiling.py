"""Profiling utilities: StepTimer EMA accounting and the jax trace context
(writes a TensorBoard-viewable trace directory)."""

import os

from robo_vln_tpu.utils import profiling


def test_step_timer_ema():
    t = profiling.StepTimer("unit", log_every=2)
    for _ in range(4):
        with t:
            pass
    assert t.average is not None and t.average >= 0.0


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path)):
        float(jnp.ones((8,)).sum())
    # jax writes plugins/profile/<ts>/ under the log dir
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if f.endswith((".trace.json.gz", ".pb", ".xplane.pb"))]
    assert found, "no trace artifacts written"
