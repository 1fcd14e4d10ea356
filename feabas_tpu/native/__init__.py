"""Native (C++) host-plane helpers, loaded via ctypes.

The shared library builds on first use with g++ (cached next to the
source); every entry point has a pure-numpy fallback so the framework
works without a toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'rasterize.cpp')
_LIB = os.path.join(_HERE, 'librasterize.so')
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _LIB],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.rasterize_triangles.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double]
            lib.field_from_tids.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_double, ctypes.c_double,
                ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def available():
    return _load() is not None


def rasterize_triangles(verts, tris, H, W, x0, y0, weights=None):
    """C++ tid-map rasterization; returns (H, W) int32 (-1 outside) or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    tid = np.full((H, W), -1, dtype=np.int32)
    if weights is not None:
        weights = np.ascontiguousarray(weights, dtype=np.float32)
        wmap = np.full((H, W), -np.inf, dtype=np.float32)
        wptr = wmap.ctypes.data
        wgt_ptr = weights.ctypes.data
    else:
        wptr = None
        wgt_ptr = None
    lib.rasterize_triangles(
        verts.ctypes.data, verts.shape[0],
        tris.ctypes.data, tris.shape[0],
        wgt_ptr, tid.ctypes.data, wptr,
        H, W, float(x0), float(y0))
    return tid


def field_from_tids(tid, A, b, x0, y0):
    """C++ affine-field evaluation; returns (map_x, map_y) float32 with
    NaN outside, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    tid = np.ascontiguousarray(tid, dtype=np.int32)
    A = np.ascontiguousarray(A, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    H, W = tid.shape
    map_x = np.empty((H, W), np.float32)
    map_y = np.empty((H, W), np.float32)
    lib.field_from_tids(tid.ctypes.data, H, W, A.ctypes.data, b.ctypes.data,
                        float(x0), float(y0),
                        map_x.ctypes.data, map_y.ctypes.data)
    return map_x, map_y
