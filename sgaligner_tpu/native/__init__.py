"""Native host library: C++ KD-tree via ctypes.

Builds ``libsgakdtree.so`` from kdtree.cpp with g++ on first use (cached next
to the source; rebuilt when the source is newer). All consumers must handle
``available() == False`` and fall back to scipy — the native path is a host
performance component (OpenMP-parallel queries on 100k+ point clouds), not a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "kdtree.cpp")
_LIB = osp.join(_HERE, "libsgakdtree.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if (not osp.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.sga_kdtree_build.restype = ctypes.c_void_p
        lib.sga_kdtree_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.sga_kdtree_free.argtypes = [ctypes.c_void_p]
        lib.sga_kdtree_nn.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float)]
        lib.sga_kdtree_radius_exists.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class KDTree:
    """3D KD-tree over [n, 3] float points (native C++)."""

    def __init__(self, points: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native kdtree unavailable (g++ build failed)")
        self._lib = lib
        self._pts = np.ascontiguousarray(points[:, :3], np.float32)
        self._handle = lib.sga_kdtree_build(
            self._pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._pts))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.sga_kdtree_free(self._handle)
            self._handle = None

    def query(self, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """1-NN: returns (distances [m], indices [m])."""
        q = np.ascontiguousarray(queries[:, :3], np.float32)
        m = len(q)
        idx = np.empty(m, np.int32)
        dist = np.empty(m, np.float32)
        self._lib.sga_kdtree_nn(
            self._handle, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return dist.astype(np.float64), idx.astype(np.int64)

    def radius_exists(self, queries: np.ndarray, radius: float) -> np.ndarray:
        """Boolean mask: any tree point within radius of each query."""
        q = np.ascontiguousarray(queries[:, :3], np.float32)
        m = len(q)
        out = np.empty(m, np.uint8)
        self._lib.sga_kdtree_radius_exists(
            self._handle, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
            ctypes.c_float(radius),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)
