"""msgpack serialization with numpy support (msgpack_numpy equivalent).

The reference packs each episode as msgpack with msgpack_numpy
(robo_vln_trainer.py:485-488, :224-227).  That package isn't in the image, so
this is a ~40-line drop-in: ndarrays become tagged dicts
``{b'nd': True, b'type': dtype.str, b'shape': ..., b'data': bytes}`` — the
same convention msgpack_numpy uses, so buffers written by the reference
pipeline remain readable.
"""

from __future__ import annotations

from typing import Any

import msgpack
import numpy as np


def _encode(obj: Any):
    if isinstance(obj, np.ndarray):
        contiguous = np.ascontiguousarray(obj)
        return {
            b"nd": True,
            b"type": obj.dtype.str,
            b"shape": list(obj.shape),
            b"data": contiguous.tobytes(),
        }
    if isinstance(obj, (np.generic,)):
        return {b"nd": False, b"type": obj.dtype.str, b"data": obj.tobytes()}
    raise TypeError(f"Cannot serialize {type(obj)}")


def _decode(obj):
    if b"nd" in obj:
        if obj[b"nd"]:
            return np.frombuffer(
                obj[b"data"], dtype=np.dtype(obj[b"type"])
            ).reshape(obj[b"shape"]).copy()
        return np.frombuffer(obj[b"data"], dtype=np.dtype(obj[b"type"]))[0]
    if "nd" in obj:  # raw=False path
        if obj["nd"]:
            return np.frombuffer(
                obj["data"], dtype=np.dtype(obj["type"])
            ).reshape(obj["shape"]).copy()
        return np.frombuffer(obj["data"], dtype=np.dtype(obj["type"]))[0]
    return obj


def packb(obj: Any) -> bytes:
    return msgpack.packb(obj, default=_encode, use_bin_type=True)


def unpackb(data: bytes) -> Any:
    return msgpack.unpackb(data, object_hook=_decode, raw=False, strict_map_key=False)
