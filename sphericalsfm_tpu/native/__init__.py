"""Native C++ host kernels, built on demand and loaded via ctypes.

The compute path of the framework is JAX/XLA; these are the runtime's
host-side graph kernels (union-find track building, connected components).
A pure-numpy fallback lives next to each call site, so the framework works
without a toolchain; with g++ available the shared library builds once into
this directory and is reused.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph.cpp")
_LIB = os.path.join(_DIR, "libsfmgraph.so")

_lib = None


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        raise ImportError("native graph library unavailable")
    lib = ctypes.CDLL(_LIB)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.sfm_union_find.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
    ]
    lib.sfm_union_find.restype = None
    lib.sfm_connected_components.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
    ]
    lib.sfm_connected_components.restype = ctypes.c_int64
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.sfm_triplet_filter.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p,
        ctypes.c_double, u8p,
    ]
    lib.sfm_triplet_filter.restype = None
    _lib = lib
    return lib


class graph:
    """Namespace mirroring the C ABI."""

    @staticmethod
    def union_find(n: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        lib = _load()
        a = np.ascontiguousarray(a, np.int64)
        b = np.ascontiguousarray(b, np.int64)
        out = np.empty(n, np.int64)
        lib.sfm_union_find(n, len(a), a, b, out)
        return out

    @staticmethod
    def connected_components(n: int, a: np.ndarray, b: np.ndarray):
        lib = _load()
        a = np.ascontiguousarray(a, np.int64)
        b = np.ascontiguousarray(b, np.int64)
        out = np.empty(n, np.int64)
        k = lib.sfm_connected_components(n, len(a), a, b, out)
        return out, int(k)

    @staticmethod
    def triplet_filter(num_frames: int, ei: np.ndarray, ej: np.ndarray,
                       R: np.ndarray, thresh: float,
                       keep: np.ndarray) -> np.ndarray:
        lib = _load()
        ei = np.ascontiguousarray(ei, np.int64)
        ej = np.ascontiguousarray(ej, np.int64)
        R = np.ascontiguousarray(R.reshape(len(ei), 9), np.float64)
        keep_io = np.ascontiguousarray(keep, np.uint8).copy()
        lib.sfm_triplet_filter(num_frames, len(ei), ei, ej, R,
                               float(thresh), keep_io)
        return keep_io.astype(bool)


# Trigger the build early so callers can fall back cleanly.
_load()
