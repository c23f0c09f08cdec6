"""Process-parallel loader (data/parallel_loader.py): content equality with
the in-process iterator, shared-memory segment recycling, determinism, and
worker-error propagation."""

import numpy as np
import pytest

from robo_vln_tpu.data.loader import (
    TrajectoryDataset,
    batch_iterator,
    write_episode,
)
from robo_vln_tpu.data.parallel_loader import parallel_batch_iterator
from robo_vln_tpu.data.trajectory_store import TrajectoryStore

from tests.test_data import _make_episode

BUCKETS = [6, 10]
L = 12


def _build_store(tmp_path, rng, n_eps=10):
    path = str(tmp_path / "buf")
    with TrajectoryStore(path, writable=True) as store:
        for k in range(n_eps):
            t = int(rng.integers(4, 10))
            write_episode(store, k, *_make_episode(rng, t))
    return path


def _episode_fingerprints(batches):
    """Per-episode fingerprint: (first instruction id, frame count, rgb sum)
    for every REAL (unpadded) episode in a batch stream."""
    out = []
    for b in batches:
        for i in range(b["valid_mask"].shape[0]):
            n = int(b["valid_mask"][i].sum())
            if n == 0:
                continue  # tail padding
            out.append((
                int(b["instruction"][i, 0]),
                n,
                round(float(b["rgb"][i, :n].astype(np.float64).sum()), 3),
            ))
    return sorted(out)


def test_parallel_matches_inprocess_content(tmp_path, rng):
    path = _build_store(tmp_path, rng)

    single = batch_iterator(
        TrajectoryDataset(path, batch_size=2, seed=0), 2, BUCKETS, L
    )
    ref = _episode_fingerprints(single)

    par = parallel_batch_iterator(
        path, 2, BUCKETS, L, num_workers=2, seed=0,
    )
    got = _episode_fingerprints(par)
    assert got == ref, "parallel loader lost/duplicated/altered episodes"


def test_parallel_batch_invariants(tmp_path, rng):
    path = _build_store(tmp_path, rng, n_eps=7)
    batches = list(parallel_batch_iterator(
        path, 2, BUCKETS, L, num_workers=2, seed=3,
    ))
    # 7 episodes over 2 interleaved shards (4 + 3) -> 2 + 2 full/padded
    assert len(batches) == 4
    for b in batches:
        assert b["rgb"].shape[0] == 2
        assert b["rgb"].shape[1] in BUCKETS
        assert b["instruction"].shape == (2, L)
        assert b["not_done_masks"][:, 0].sum() == 0.0
        # padding rows are fully masked and zeroed
        for i in range(2):
            n = int(b["valid_mask"][i].sum())
            assert not b["rgb"][i, n:].any()
    # exactly one padded episode (7 = 2*2 + 3: worker shards 4|3, one tail)
    pad_eps = sum(
        1 for b in batches for i in range(2)
        if b["valid_mask"][i].sum() == 0
    )
    assert pad_eps == 1


def test_parallel_deterministic_and_segments_recycle(tmp_path, rng):
    # more batches per worker than segments (2) forces pool recycling
    path = _build_store(tmp_path, rng, n_eps=12)

    def run():
        return _episode_fingerprints(parallel_batch_iterator(
            path, 1, BUCKETS, L, num_workers=2, seed=7,
            segments_per_worker=2,
        ))

    a, b = run(), run()
    assert a == b and len(a) == 12


def test_parallel_worker_error_propagates(tmp_path, rng):
    path = _build_store(tmp_path, rng, n_eps=6)
    # corrupt one episode: the parent's sizing probe only decodes episode 0,
    # so the failure surfaces inside a WORKER and must propagate
    with TrajectoryStore(path, writable=True) as store:
        store.put(5, b"\x00garbage")
    with pytest.raises(RuntimeError, match="loader worker"):
        list(parallel_batch_iterator(
            path, 2, BUCKETS, L, num_workers=2, seed=0,
        ))


def test_parallel_falls_back_below_two_workers(tmp_path, rng):
    path = _build_store(tmp_path, rng, n_eps=4)
    single = _episode_fingerprints(batch_iterator(
        TrajectoryDataset(path, batch_size=2, seed=5), 2, BUCKETS, L
    ))
    fallback = _episode_fingerprints(parallel_batch_iterator(
        path, 2, BUCKETS, L, num_workers=1, seed=5,
    ))
    assert fallback == single


def test_parallel_stall_diagnostic_on_retained_batches(tmp_path, rng):
    """A consumer that retains >= segments_per_worker live batches from one
    worker exhausts its free-segment pool; the worker blocks on free_q.get()
    and (pre-fix) the parent spun on Empty forever — a silent livelock
    (ADVICE r4 medium).  The drain loop must raise a diagnostic naming the
    exhausted pool instead."""
    path = _build_store(tmp_path, rng, n_eps=12)
    retained = []
    # stall_timeout must outlast worker spawn+import (several seconds on a
    # 1-CPU host) so the first batches actually arrive before the livelock
    it = parallel_batch_iterator(
        path, 2, BUCKETS, L, num_workers=2, seed=0,
        segments_per_worker=1, stall_timeout_s=25.0,
    )
    with pytest.raises(RuntimeError, match="free pool"):
        for b in it:
            retained.append(b)  # never release -> pool exhausts
    assert retained, "expected at least one batch before the stall"
