"""Async host-side env pool.

TPU-native replacement for habitat.VectorEnv (reference construct_envs,
env_utils.py:117-205 — fork-server processes, defined but unused by the
shipped trainers): a thread pool steps N envs concurrently while the device
computes, with a bounded queue providing double buffering so the accelerator
never waits on simulation (SURVEY.md §2.6).  Threads (not processes) because
the kinematic sim is C++ behind ctypes (releases the GIL in native code) and
observation assembly is numpy; a process pool drop-in would only change the
executor.

API mirrors VectorEnv: reset() -> list of obs; async_step(actions) +
wait_step() -> list of (obs, reward, done, info); step(actions) for the
synchronous convenience.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence



class AsyncEnvPool:
    def __init__(self, envs: Sequence, max_workers: Optional[int] = None):
        self.envs = list(envs)
        self._pool = ThreadPoolExecutor(max_workers=max_workers or len(envs))
        self._pending = None

    @property
    def num_envs(self) -> int:
        return len(self.envs)

    def reset(self) -> List:
        futures = [self._pool.submit(e.reset) for e in self.envs]
        return [f.result() for f in futures]

    def reset_at(self, idx: int):
        return self.envs[idx].reset()

    def async_step(self, actions: Sequence) -> None:
        assert self._pending is None, "previous step not collected"
        self._pending = [
            self._pool.submit(e.step, a) for e, a in zip(self.envs, actions)
        ]

    def wait_step(self) -> List:
        assert self._pending is not None, "no step in flight"
        out = [f.result() for f in self._pending]
        self._pending = None
        return out

    def step(self, actions: Sequence) -> List:
        self.async_step(actions)
        return self.wait_step()

    def call_at(self, idx: int, fn_name: str, *args, **kwargs):
        return getattr(self.envs[idx], fn_name)(*args, **kwargs)

    def current_episodes(self) -> List:
        return [e.habitat_env.current_episode for e in self.envs]

    def close(self) -> None:
        for e in self.envs:
            e.close()
        self._pool.shutdown(wait=False)


class DoubleBufferedLoader:
    """Prefetches host batches and ships them to device one step ahead
    (double buffering the host->device copy under compute)."""

    def __init__(self, iterator, put_fn: Callable, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._done = object()

        def worker():
            for item in iterator:
                self._q.put(put_fn(item))
            self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item
