"""Trajectory buffer: key-value store of serialized expert episodes.

Replaces the reference's LMDB buffer (robo_vln_trainer.py:199-239,404-501).
Primary backend is the native C++ store (sim/trajstore.cc — append-only log +
mmap reads, built on demand); a pure-Python backend reads/writes the identical
on-disk format and is used when the native build is unavailable.

Values are arbitrary bytes; the episode-level (de)serialization lives in
data/serialization.py (msgpack+numpy, format-compatible with msgpack_numpy).
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Optional

import numpy as np

_REC = struct.Struct("<QQQ")
_HDR = struct.Struct("<QQ")


class _NativeStore:
    def __init__(self, path: str, writable: bool):
        from robo_vln_tpu.sim.build import ensure_built

        lib = ctypes.CDLL(ensure_built("trajstore"))
        lib.ts_open.restype = ctypes.c_void_p
        lib.ts_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.ts_put.restype = ctypes.c_int
        lib.ts_put.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.ts_get_len.restype = ctypes.c_int64
        lib.ts_get_len.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ts_get.restype = ctypes.c_int
        lib.ts_get.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ]
        lib.ts_count.restype = ctypes.c_uint64
        lib.ts_count.argtypes = [ctypes.c_void_p]
        lib.ts_flush.restype = ctypes.c_int
        lib.ts_flush.argtypes = [ctypes.c_void_p]
        lib.ts_close.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.ts_open(path.encode(), 1 if writable else 0)
        if not self._h:
            raise IOError(f"cannot open trajectory store at {path}")

    def put(self, key: int, data: bytes) -> None:
        rc = self._lib.ts_put(self._h, key, data, len(data))
        if rc != 0:
            raise IOError(f"ts_put failed rc={rc}")

    def get_buffer(self, key: int) -> np.ndarray:
        """Value bytes as a (n,) uint8 array: ONE memcpy from the store's
        mmap into a fresh numpy buffer (no ctypes zero-fill, no bytes()
        re-copy) — the decode path builds zero-copy views over it."""
        n = self._lib.ts_get_len(self._h, key)
        if n < 0:
            raise KeyError(key)
        buf = np.empty(n, np.uint8)
        rc = self._lib.ts_get(
            self._h, key,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        )
        if rc != 0:
            raise IOError(f"ts_get failed rc={rc}")
        return buf

    def get(self, key: int) -> bytes:
        return self.get_buffer(key).tobytes()

    def __len__(self) -> int:
        return int(self._lib.ts_count(self._h))

    def flush(self) -> None:
        self._lib.ts_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None


class _PythonStore:
    """Same on-disk format, pure Python."""

    def __init__(self, path: str, writable: bool):
        os.makedirs(path, exist_ok=True)
        self._dat_path = os.path.join(path, "store.dat")
        self._idx_path = os.path.join(path, "store.idx")
        self._index = {}
        if os.path.exists(self._idx_path):
            with open(self._idx_path, "rb") as f:
                data = f.read()
            for off in range(0, len(data) - len(data) % _REC.size, _REC.size):
                key, doff, dlen = _REC.unpack_from(data, off)
                self._index[key] = (doff, dlen)
        open(self._dat_path, "ab").close()
        self._dat_w = open(self._dat_path, "ab") if writable else None
        self._idx_w = open(self._idx_path, "ab") if writable else None
        self._dat_r = open(self._dat_path, "rb")
        self._size = os.path.getsize(self._dat_path)

    def put(self, key: int, data: bytes) -> None:
        off = self._size + _HDR.size
        self._dat_w.write(_HDR.pack(key, len(data)))
        self._dat_w.write(data)
        self._idx_w.write(_REC.pack(key, off, len(data)))
        self._size += _HDR.size + len(data)
        self._index[key] = (off, len(data))

    def get_buffer(self, key: int) -> np.ndarray:
        off, n = self._index[key]
        if self._dat_w:
            self._dat_w.flush()
        self._dat_r.seek(off)
        buf = np.empty(n, np.uint8)
        read = self._dat_r.readinto(memoryview(buf))
        if read != n:
            raise IOError(f"short read: {read}/{n} bytes for key {key}")
        return buf

    def get(self, key: int) -> bytes:
        return self.get_buffer(key).tobytes()

    def __len__(self) -> int:
        return len(self._index)

    def flush(self) -> None:
        if self._dat_w:
            self._dat_w.flush()
            self._idx_w.flush()

    def close(self) -> None:
        for f in (self._dat_w, self._idx_w, self._dat_r):
            if f:
                f.close()


class TrajectoryStore:
    """Facade picking the native backend, falling back to Python."""

    def __init__(self, path: str, writable: bool = False, backend: Optional[str] = None):
        self.path = path
        if backend is None:
            backend = os.environ.get("ROBO_VLN_STORE_BACKEND", "native")
        if backend == "native":
            try:
                self._impl = _NativeStore(path, writable)
            except Exception:
                self._impl = _PythonStore(path, writable)
        else:
            self._impl = _PythonStore(path, writable)

    def put(self, key: int, data: bytes) -> None:
        self._impl.put(key, data)

    def get(self, key: int) -> bytes:
        return self._impl.get(key)

    def get_buffer(self, key: int) -> np.ndarray:
        """Value bytes as a (n,) uint8 array with a single copy; decode
        zero-copy via data/serialization.unpackb_any."""
        return self._impl.get_buffer(key)

    def __len__(self) -> int:
        return len(self._impl)

    def flush(self) -> None:
        self._impl.flush()

    def close(self) -> None:
        self._impl.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
