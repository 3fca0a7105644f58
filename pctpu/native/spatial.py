"""Host-side spatial index: native C++ KD-tree and octree (ctypes).

Python face of ``spatial.cpp`` — the parity layer for the reference's
from-scratch trees (``Kdtree_Octree/lesson2/kdtree.py:119-208``,
``octree.py:262-328``) and result sets (``result_set.py:15-93``). Query
results come back as fixed-shape arrays plus per-query true-neighbor counts
and distance-comparison counters (the reference's
``KNNResultSet.comparison_counter`` observable, ``result_set.py:24,59``).

These trees are for the HOST side (ETL grouping, benchmarking, ad-hoc
queries); the TPU compute path uses ``pctpu.ops`` (MXU-tiled brute force,
Pallas 1-NN, grid-hash buckets). A scipy ``cKDTree`` fallback keeps the API
alive when no C++ toolchain is present (counters report -1 there).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "spatial.cpp")
_SO = os.path.join(_HERE, "_spatial.so")
_lib = None
_tried = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)
_i64p = ctypes.POINTER(ctypes.c_long)


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC,
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [_f32p, ctypes.c_long, ctypes.c_int]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_node_count.restype = ctypes.c_long
    lib.kdtree_node_count.argtypes = [ctypes.c_void_p]
    lib.kdtree_knn.argtypes = [ctypes.c_void_p, _f32p, ctypes.c_long,
                               ctypes.c_int, _i32p, _f32p, _i64p,
                               ctypes.c_int]
    lib.kdtree_radius.argtypes = [ctypes.c_void_p, _f32p, ctypes.c_long,
                                  ctypes.c_float, ctypes.c_int, _i32p, _f32p,
                                  _i32p, _i64p, ctypes.c_int]
    lib.octree_build.restype = ctypes.c_void_p
    lib.octree_build.argtypes = [_f32p, ctypes.c_long, ctypes.c_int,
                                 ctypes.c_float]
    lib.octree_free.argtypes = [ctypes.c_void_p]
    lib.octree_node_count.restype = ctypes.c_long
    lib.octree_node_count.argtypes = [ctypes.c_void_p]
    lib.octree_knn.argtypes = [ctypes.c_void_p, _f32p, ctypes.c_long,
                               ctypes.c_int, _i32p, _f32p, _i64p,
                               ctypes.c_int]
    lib.octree_radius.argtypes = [ctypes.c_void_p, _f32p, ctypes.c_long,
                                  ctypes.c_float, ctypes.c_int, _i32p, _f32p,
                                  _i32p, _i64p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_f32_c(x: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(np.asarray(x)[:, :3], np.float32)
    if a.ndim != 2 or a.shape[1] != 3:
        raise ValueError(f"expected (N,3) points, got {a.shape}")
    return a


class _TreeBase:
    """Shared query plumbing; subclasses set the native symbol prefix."""

    _prefix = ""

    def __init__(self):
        self._h = None
        self._lib = None
        self._fallback = None  # scipy cKDTree
        self.n = 0

    def __del__(self):
        if self._h and self._lib is not None:
            getattr(self._lib, self._prefix + "_free")(self._h)
            self._h = None

    @property
    def native(self) -> bool:
        return self._h is not None

    @property
    def node_count(self) -> int:
        if not self.native:
            return -1
        return int(getattr(self._lib, self._prefix + "_node_count")(self._h))

    def knn(self, queries: np.ndarray, k: int, n_threads: int = 8
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """k nearest neighbors. Returns (idx [Q,k], dist2 [Q,k],
        comparisons [Q]) — idx -1 where fewer than k points exist."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        q = _as_f32_c(queries)
        nq = q.shape[0]
        idx = np.empty((nq, k), np.int32)
        d2 = np.empty((nq, k), np.float32)
        cmp = np.empty((nq,), np.int64)
        if self.native:
            getattr(self._lib, self._prefix + "_knn")(
                self._h, q.ctypes.data_as(_f32p), nq, k,
                idx.ctypes.data_as(_i32p), d2.ctypes.data_as(_f32p),
                cmp.ctypes.data_as(_i64p), n_threads)
            return idx, d2, cmp
        dd, ii = self._fallback.query(q, k=k)
        dd = np.atleast_2d(dd.astype(np.float64))
        ii = np.atleast_2d(ii)
        if dd.shape[0] != nq:  # k==1 returns (Q,)
            dd, ii = dd.T, ii.T
        bad = ~np.isfinite(dd)
        ii = np.where(bad, -1, ii)
        return (ii.astype(np.int32), np.where(bad, np.inf, dd ** 2
                                              ).astype(np.float32),
                np.full((nq,), -1, np.int64))

    def radius(self, queries: np.ndarray, r: float, cap: int = 64,
               n_threads: int = 8, **kw
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Radius search. Returns (idx [Q,cap] (-1 padded), dist2 [Q,cap],
        count [Q] — TRUE neighbor count, may exceed cap, comparisons [Q])."""
        q = _as_f32_c(queries)
        nq = q.shape[0]
        idx = np.empty((nq, cap), np.int32)
        # C++ writes only the first `found` slots per query; pre-fill the
        # padding so both backends pad dist2 with inf (ADVICE r1).
        d2 = np.full((nq, cap), np.inf, np.float32)
        cnt = np.empty((nq,), np.int32)
        cmp = np.empty((nq,), np.int64)
        if self.native:
            self._radius_native(q, nq, r, cap, idx, d2, cnt, cmp,
                                n_threads, **kw)
            return idx, d2, cnt, cmp
        lists = self._fallback.query_ball_point(q, r)
        idx.fill(-1)
        d2.fill(np.inf)
        for i, lst in enumerate(lists):
            cnt[i] = len(lst)
            take = lst[:cap]
            idx[i, : len(take)] = take
            if take:
                diff = self._fb_pts[take] - q[i]
                d2[i, : len(take)] = (diff ** 2).sum(-1)
        return idx, d2, cnt, np.full((nq,), -1, np.int64)


class KDTree(_TreeBase):
    """Median-split round-robin-axis KD-tree (``kdtree.py:119-137``)."""

    _prefix = "kdtree"

    def __init__(self, points: np.ndarray, leaf_size: int = 32):
        super().__init__()
        pts = _as_f32_c(points)
        self.n = pts.shape[0]
        self.leaf_size = leaf_size
        lib = get_lib()
        if lib is not None:
            self._lib = lib
            self._h = lib.kdtree_build(pts.ctypes.data_as(_f32p),
                                       self.n, leaf_size)
        if self._h is None:
            from scipy.spatial import cKDTree
            self._fb_pts = pts
            self._fallback = cKDTree(pts, leafsize=leaf_size)

    def _radius_native(self, q, nq, r, cap, idx, d2, cnt, cmp, n_threads):
        self._lib.kdtree_radius(
            self._h, q.ctypes.data_as(_f32p), nq, r, cap,
            idx.ctypes.data_as(_i32p), d2.ctypes.data_as(_f32p),
            cnt.ctypes.data_as(_i32p), cmp.ctypes.data_as(_i64p), n_threads)


class Octree(_TreeBase):
    """8-way morton-split octree (``octree.py:310-328``); radius search has
    the ``contains()`` no-distance-check fast path at every level (the
    reference's only fired at the root — ``octree.py:199,208``, SURVEY §0)."""

    _prefix = "octree"

    def __init__(self, points: np.ndarray, leaf_size: int = 32,
                 min_extent: float = 1e-4):
        super().__init__()
        pts = _as_f32_c(points)
        self.n = pts.shape[0]
        self.leaf_size = leaf_size
        self.min_extent = min_extent
        lib = get_lib()
        if lib is not None:
            self._lib = lib
            self._h = lib.octree_build(pts.ctypes.data_as(_f32p), self.n,
                                       leaf_size, min_extent)
        if self._h is None:
            from scipy.spatial import cKDTree
            self._fb_pts = pts
            self._fallback = cKDTree(pts, leafsize=leaf_size)

    def _radius_native(self, q, nq, r, cap, idx, d2, cnt, cmp, n_threads,
                       fast: bool = True):
        self._lib.octree_radius(
            self._h, q.ctypes.data_as(_f32p), nq, r, cap,
            idx.ctypes.data_as(_i32p), d2.ctypes.data_as(_f32p),
            cnt.ctypes.data_as(_i32p), cmp.ctypes.data_as(_i64p),
            1 if fast else 0, n_threads)
