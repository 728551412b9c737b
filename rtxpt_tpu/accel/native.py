"""ctypes binding + lazy build of the native (C++) LBVH builder.

Compiles csrc/lbvh.cpp once into a cached shared object and exposes
`build_bvh_native`. Falls back silently (returns None loader) when no
toolchain is available — rtxpt_tpu/accel/lbvh.py then uses the numpy
builder. The native path matters for per-frame rebuilds of animated
scenes (reference: UpdateSkinnedBLASs Sample.cpp:1170-1198)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "csrc", "lbvh.cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path()
    if not os.path.exists(src):
        return None
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(os.path.expanduser("~"), ".cache", "rtxpt_tpu")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"librtxpt_lbvh-{tag}.so")
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so + ".tmp", src],
                check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.rtxpt_build_lbvh.restype = ctypes.c_int
        lib.rtxpt_build_lbvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def build_packed_native(positions: np.ndarray, indices: np.ndarray):
    """Run the C++ builder. Returns (packed_nodes [2T-1,17] f32,
    prim_tri [T] i32) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    n = len(indices)
    nodes = np.empty((2 * n - 1, 17), np.float32)
    prim_tri = np.empty((n,), np.int32)
    rc = lib.rtxpt_build_lbvh(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(positions),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        prim_tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return nodes, prim_tri
