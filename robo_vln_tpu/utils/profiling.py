"""Tracing / profiling (first-class; the reference has none, SURVEY.md §5).

* :func:`maybe_start_trace_server` — jax.profiler server for live capture
  (`ROBO_VLN_PROFILE_PORT` or config);
* :class:`StepTimer` — EMA per-step wall timing with periodic log lines and
  optional jax.profiler.TraceAnnotation scopes;
* :func:`trace` — context manager writing a TensorBoard-viewable trace of a
  code region to a directory.

Note on the tunneled single-chip setup: per-call wall times include a ~30 ms
host round trip; prefer `bench.py`'s in-jit loop method or device profiles for
kernel-level numbers.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

from robo_vln_tpu.utils.logging import logger

_server = None


def maybe_start_trace_server(port: Optional[int] = None):
    global _server
    port = port or int(os.environ.get("ROBO_VLN_PROFILE_PORT", 0))
    if port and _server is None:
        import jax

        _server = jax.profiler.start_server(port)
        logger.info(f"jax profiler server on :{port}")
    return _server


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"trace written to {log_dir}")


class StepTimer:
    def __init__(self, name: str = "step", log_every: int = 100, ema: float = 0.98):
        self.name = name
        self.log_every = log_every
        self.ema = ema
        self._avg = None
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._avg = dt if self._avg is None else (
            self.ema * self._avg + (1 - self.ema) * dt
        )
        self._count += 1
        if self._count % self.log_every == 0:
            logger.info(
                f"{self.name}: {self._avg * 1000:.1f} ms/step (ema, "
                f"n={self._count})"
            )

    @property
    def average(self) -> Optional[float]:
        return self._avg
