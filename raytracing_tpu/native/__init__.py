"""Native (C++) runtime components, loaded via ctypes.

Currently: the uniform-grid builder (gridbuild.cpp) — the host-side accel
build is the reference's heaviest ingest step (SURVEY §2.2). Compiled
lazily with g++ -O3 on first use; callers fall back to the numpy path if
the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgridbuild.so")
_SRC = os.path.join(_HERE, "gridbuild.cpp")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    i64, f32p, i32p, i64p = ctypes.c_int64, \
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), \
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), \
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.grid_count.restype = ctypes.c_int64
    lib.grid_count.argtypes = [f32p, f32p, i64, f32p, f32p, i64p, i32p]
    lib.grid_fill.restype = None
    lib.grid_fill.argtypes = [f32p, f32p, i64, f32p, f32p, i64p, i32p, i32p,
                              i32p]
    _lib = lib
    return lib


class gridbuild:
    """Namespace matching accel.grid's native hook."""

    @staticmethod
    def bin_csr(lo: np.ndarray, hi: np.ndarray, pmin: np.ndarray,
                pmax: np.ndarray, n):
        """n: (nx, ny, nz) -> (offsets (nx*ny*nz+1,) int32, payload int32)."""
        lib = _load()
        lo = np.ascontiguousarray(lo, np.float32)
        hi = np.ascontiguousarray(hi, np.float32)
        pmin = np.ascontiguousarray(pmin, np.float32)
        pmax = np.ascontiguousarray(pmax, np.float32)
        nv = np.ascontiguousarray(np.broadcast_to(np.asarray(n, np.int64), (3,)))
        ncells = int(nv.prod())
        n_obj = lo.shape[0]
        counts = np.zeros(ncells, np.int32)
        total = lib.grid_count(lo, hi, n_obj, pmin, pmax, nv, counts)
        offsets = np.zeros(ncells + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        payload = np.zeros(int(total), np.int32)
        cursor = np.zeros(ncells, np.int32)
        lib.grid_fill(lo, hi, n_obj, pmin, pmax, nv, offsets, cursor, payload)
        return offsets, payload
