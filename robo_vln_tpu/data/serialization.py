"""Episode (de)serialization: msgpack+numpy and the zero-copy flat codec.

Two wire formats, auto-detected on read (``unpackb_any``):

* **msgpack** (``packb``/``unpackb``) — msgpack_numpy-compatible tagging
  (ndarrays become ``{b'nd': True, b'type': ..., b'shape': ..., b'data':
  bytes}``), matching how the reference packs episodes into LMDB
  (robo_vln_trainer.py:485-488, :224-227); buffers written by the reference
  pipeline remain readable.  Decoding necessarily copies every array (msgpack
  materializes each bin as its own bytes object).
* **flat** (``pack_flat``/``unpack_flat``, magic ``RVF1``) — a tiny msgpack
  header (structure + dtypes/shapes/offsets) followed by 64-byte-aligned raw
  array payloads.  Decoding parses the header and returns numpy VIEWS into
  the source buffer: zero copies, zero parse cost proportional to data size.
  Used for the internal feature store (training/featurize.py), where decode
  bandwidth on a 1-core host is the system limiter at large device batches
  (benchmarks/input_pipeline.py).

Views returned by ``unpack_flat`` hold a reference to the backing buffer
(numpy ``base``), so lifetime is safe; they are read-only when the buffer is.
"""

from __future__ import annotations

import struct
from typing import Any

import msgpack
import numpy as np

FLAT_MAGIC = b"RVF1"
_ALIGN = 64


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
    # no .copy(): the view's base is the bin bytes object msgpack just
    # created for this array alone — refcounted, so lifetime is safe, and
    # skipping the copy removes a full memory pass per array (read-only is
    # fine: every consumer copies before mutating)
    if b"nd" in obj:
        if obj[b"nd"]:
            return np.frombuffer(
                obj[b"data"], dtype=np.dtype(obj[b"type"])
            ).reshape(obj[b"shape"])
        return np.frombuffer(obj[b"data"], dtype=np.dtype(obj[b"type"]))[0]
    if "nd" in obj:  # raw=False path
        if obj["nd"]:
            return np.frombuffer(
                obj["data"], dtype=np.dtype(obj["type"])
            ).reshape(obj["shape"])
        return np.frombuffer(obj["data"], dtype=np.dtype(obj["type"]))[0]
    return obj


def packb(obj: Any) -> bytes:
    return msgpack.packb(obj, default=_encode, use_bin_type=True)


def unpackb(data) -> Any:
    """Decode msgpack `data` (any bytes-like / buffer-protocol object)."""
    return msgpack.unpackb(data, object_hook=_decode, raw=False, strict_map_key=False)


def _flat_encode(obj, blocks):
    if isinstance(obj, np.ndarray):
        a = np.ascontiguousarray(obj)
        blocks.append(a)
        return {"__nd__": len(blocks) - 1, "t": a.dtype.str, "s": list(a.shape)}
    if isinstance(obj, np.generic):
        return {"__np__": True, "t": obj.dtype.str, "d": obj.tobytes()}
    if isinstance(obj, dict):
        return {k: _flat_encode(v, blocks) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_flat_encode(v, blocks) for v in obj]
    return obj


def pack_flat(obj: Any) -> bytes:
    """Encode `obj` (nested dicts/lists/scalars/ndarrays) in the flat format:
    [RVF1][u32 header_len][msgpack header][64B-aligned array payloads]."""
    blocks = []
    tree = _flat_encode(obj, blocks)
    offsets = []
    off = 0
    for a in blocks:
        offsets.append(off)
        off += -(-a.nbytes // _ALIGN) * _ALIGN
    header = msgpack.packb({"tree": tree, "off": offsets}, use_bin_type=True)
    base = -(-(8 + len(header)) // _ALIGN) * _ALIGN
    out = bytearray(base + off)
    out[:4] = FLAT_MAGIC
    out[4:8] = struct.pack("<I", len(header))
    out[8 : 8 + len(header)] = header
    for a, o in zip(blocks, offsets):
        if a.nbytes:
            np.frombuffer(out, a.dtype, a.size, base + o)[:] = a.ravel()
    return bytes(out)


def is_flat(data) -> bool:
    return len(data) >= 4 and bytes(data[:4]) == FLAT_MAGIC


def unpack_flat(data) -> Any:
    """Decode a flat buffer; ndarrays come back as zero-copy VIEWS into
    `data` (read-only iff `data` is)."""
    mv = memoryview(data)
    (hlen,) = struct.unpack("<I", mv[4:8])
    header = msgpack.unpackb(mv[8 : 8 + hlen], raw=False, strict_map_key=False)
    base = -(-(8 + hlen) // _ALIGN) * _ALIGN
    offsets = header["off"]

    def dec(node):
        if isinstance(node, dict):
            if "__nd__" in node:
                dt = np.dtype(node["t"])
                shape = node["s"]
                count = 1
                for d in shape:
                    count *= int(d)
                return np.frombuffer(
                    mv, dt, count, base + offsets[node["__nd__"]]
                ).reshape(shape)
            if "__np__" in node:
                return np.frombuffer(node["d"], np.dtype(node["t"]))[0]
            return {k: dec(v) for k, v in node.items()}
        if isinstance(node, list):
            return [dec(v) for v in node]
        return node

    return dec(header["tree"])


def unpackb_any(data) -> Any:
    """Decode either wire format (flat detected by magic)."""
    if is_flat(data):
        return unpack_flat(data)
    return unpackb(data)
