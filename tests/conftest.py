"""Test harness: run all tests on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake cluster (SURVEY.md §4): sharding
and pjit behavior is validated without real chips.  Must run before jax is
imported anywhere.
"""

import os

# Force CPU even when the ambient env points at a TPU platform (tests need a
# deterministic fp32 backend + 8 virtual devices). Set ROBO_VLN_TEST_TPU=1 to
# run the suite against real hardware instead.
if not os.environ.get("ROBO_VLN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("ROBO_VLN_TEST_TPU"):
    # The ambient axon TPU plugin force-appends itself to jax_platforms even
    # when JAX_PLATFORMS=cpu is set; pin the config flag directly.
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: this host has ONE cpu core, so compiles
# dominate the suite; with the cache warm, repeat runs (the per-commit and
# per-round invocations) skip them entirely.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
