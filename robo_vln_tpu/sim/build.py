"""On-demand builder for the native (C++) runtime components.

Compiles the .cc sources in this directory into shared libraries loaded via
ctypes.  Build is cached by source mtime; g++ is part of the baked toolchain.
"""

from __future__ import annotations

import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()

_LIBS = {
    "trajstore": ["trajstore.cc"],
    "kinematics": ["kinematics.cc"],
    "dtw": ["dtw.cc"],
}


def lib_path(name: str) -> str:
    return os.path.join(_DIR, f"lib{name}.so")


def ensure_built(name: str) -> str:
    """Build lib<name>.so if missing or stale; returns its path."""
    sources = [os.path.join(_DIR, s) for s in _LIBS[name]]
    out = lib_path(name)
    with _LOCK:
        if os.path.exists(out):
            src_mtime = max(os.path.getmtime(s) for s in sources)
            if os.path.getmtime(out) >= src_mtime:
                return out
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            *sources, "-o", out,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return out
