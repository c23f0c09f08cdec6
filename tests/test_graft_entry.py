"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 verdict: the scored multi-chip artifact failed because
dryrun_multichip assumed n devices were already visible instead of
bootstrapping the virtual CPU mesh itself (VERDICT.md item 1).  These tests
pin the fix at the exact interface the driver uses.
"""

import subprocess
import sys

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_inline():
    """With 8 virtual CPU devices already visible (conftest), the impl runs
    inline and produces finite metrics (asserts internally)."""
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_subprocess():
    """The driver calls dryrun_multichip from a process that may see ONE real
    device.  Simulate that: a subprocess with no virtual-device flags and a
    request for more devices than it has — the entry point must re-exec and
    still succeed."""
    code = (
        "import os\n"
        "os.environ.pop('XLA_FLAGS', None)\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(4)\n"
    )
    env = {"PYTHONPATH": "."}
    import os

    full_env = dict(os.environ)
    full_env.pop("XLA_FLAGS", None)
    full_env.update(env)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/root/repo", env=full_env, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "dryrun_multichip(4) ok" in proc.stdout
