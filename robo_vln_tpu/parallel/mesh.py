"""Device mesh and sharding rules.

The reference's parallelism surface (SURVEY.md §2.6) maps to jax.sharding:

* DDP/NCCL stanza (config/default.py:32-38, utils.py:204-226 — declared but
  never used)  ->  the "data" mesh axis: batches are sharded over ICI, XLA
  inserts the gradient psums;
* the 2-GPU model split of the hierarchical trainer -> gone: both modules jit
  into one program; the "model" axis exists for scaling larger variants.

Batch layout is batch-major (B, T, ...): axis 0 of every batch entry is the
batch axis, sharded over "data"; hidden state (layers, B, H) shards axis 1.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (-1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // known
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def make_training_mesh(
    mesh_shape: Sequence[int],
    axis_names: Sequence[str],
    batch_size: int,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """make_mesh, but the "data" axis is clamped to gcd(batch_size, devices)
    so small batches (the paper configs use batch 1!) still compile — unused
    devices are simply left out of the mesh."""
    import math

    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    names = list(axis_names)
    di = names.index("data")
    known = int(np.prod([s for s in shape if s != -1]))
    if shape[di] == -1:
        shape[di] = len(devices) // known
    shape[di] = math.gcd(batch_size, shape[di])
    needed = int(np.prod(shape))
    return make_mesh(shape, names, devices[:needed])


def batch_sharding(mesh: Mesh, key: str) -> NamedSharding:
    """Sharding for one batch entry: batch axis (0) over "data"."""
    del key
    return NamedSharding(mesh, P("data"))


def hidden_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "data"))  # (layers, B, H)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Device-put a host batch with the standard shardings."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, k)) for k, v in batch.items()
    }
