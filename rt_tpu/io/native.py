"""ctypes bridge to the native host library (rt_tpu/native/rt_native.cpp).

Built lazily with g++ on first use and cached next to the source; every
entry point degrades gracefully to the pure-Python implementation when no
compiler is available (import never fails)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "..", "native", "rt_native.cpp")
        out = os.path.join(here, "..", "native", "librt_native.so")
        try:
            if (not os.path.exists(out)
                    or os.path.getmtime(out) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", out, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(out)
            lib.rt_write_ppm.restype = ctypes.c_int
            lib.rt_write_ppm.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.rt_build_bvh.restype = ctypes.c_int
            lib.rt_build_bvh.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_write_ppm(path: str, u8_topdown: np.ndarray) -> bool:
    """C fast path for the ASCII PPM writer; False -> caller falls back."""
    lib = _build_and_load()
    if lib is None:
        return False
    img = np.ascontiguousarray(u8_topdown.astype(np.uint8))
    h, w, _ = img.shape
    rc = lib.rt_write_ppm(
        path.encode(), w, h,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return rc == 0


def native_build_bvh(bmin: np.ndarray, bmax: np.ndarray):
    """Median-split threaded BVH (taichi-version/bvh.py semantics).

    bmin/bmax: [n,3] f32 primitive AABBs. Returns dict of flat arrays
    (obj_id, left_id, right_id, next_id, bmin, bmax) with 2n-1 nodes, or
    None if the native library is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = bmin.shape[0]
    m = 2 * n - 1
    obj_id = np.empty(m, np.int32)
    left_id = np.empty(m, np.int32)
    right_id = np.empty(m, np.int32)
    next_id = np.empty(m, np.int32)
    bmin_o = np.empty((m, 3), np.float32)
    bmax_o = np.empty((m, 3), np.float32)

    def f32p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def i32p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.rt_build_bvh(n, f32p(bmin), f32p(bmax), i32p(obj_id),
                          i32p(left_id), i32p(right_id), i32p(next_id),
                          f32p(bmin_o), f32p(bmax_o))
    if rc != m:
        return None
    return dict(obj_id=obj_id, left_id=left_id, right_id=right_id,
                next_id=next_id, bmin=bmin_o, bmax=bmax_o)
