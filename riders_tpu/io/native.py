"""ctypes bindings for the native (C++) host kernels.

The offline preprocessing interpolates one full lidar frame per image; the
scipy/Qhull path costs hundreds of ms per frame, dominating dataset
builds.  `native/delaunay.cpp` reimplements it (Bowyer-Watson + barycentric
rasterization) at a fraction of the cost.  The library is built on demand
with `make -C native` (or cmake) and loaded lazily; every caller falls
back to scipy when the toolchain or binary is unavailable, so the native
path is an accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libriders_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.delaunay_interpolate.restype = ctypes.c_int
            lib.delaunay_interpolate.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except OSError:
            _load_failed = True
        return _lib


def delaunay_interpolate_native(depth_map: np.ndarray,
                                validity_map: Optional[np.ndarray] = None,
                                fill: float = 0.0
                                ) -> Optional[np.ndarray]:
    """Native barycentric densification of a sparse (H, W) map; None when
    the native library is unavailable (callers fall back to scipy)."""
    lib = load()
    if lib is None:
        return None
    if validity_map is None:
        validity_map = depth_map > 0.0
    rows, cols = np.where(validity_map)
    values = np.ascontiguousarray(depth_map[rows, cols], np.float32)
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    H, W = depth_map.shape
    out = np.empty((H, W), np.float32)
    ret = lib.delaunay_interpolate(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(values), H, W, ctypes.c_float(fill),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if ret != 0:
        return np.full((H, W), fill, np.float32)
    return out
