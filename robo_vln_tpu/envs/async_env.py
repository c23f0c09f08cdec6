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
from typing import List, Optional, Sequence



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


def window_stream(batches, shard_fn, split_fn):
    """TBPTT-window prefetch: the worker thread decodes/collates the next
    batch, splits it into windows, and device_puts ONE WINDOW AHEAD — the
    host->device copy overlaps compute without materializing whole batches
    on device (a T=1000 bucket batch is ~1 GB; a window is ~1/10th).

    Yields (is_first_window_of_batch, sharded_window); worker exceptions
    propagate to the consumer."""
    import queue
    import threading

    q = queue.Queue(maxsize=2)  # two windows in flight + one consuming
    done = object()
    err = []

    def worker():
        try:
            for batch in batches:
                first = True
                for w in split_fn(batch):
                    q.put((first, shard_fn(w)))
                    first = False
        except BaseException as e:  # noqa: BLE001 — re-raised below
            err.append(e)
        finally:
            q.put(done)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item
