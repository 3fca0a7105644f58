"""Native (C++) host-side components with ctypes bindings.

Replaces the reference's native build machinery (pybind11 CMake trees,
SURVEY.md C35/C48) with a single g++ -shared compile, cached next to the
source; every entry point has a pure-NumPy fallback so the package works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastio.cpp")
_SO = os.path.join(_HERE, "_fastio.so")
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library, or None."""
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
    lib.read_f32.restype = ctypes.c_long
    lib.read_f32.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.batch_read_f32.restype = ctypes.c_int
    lib.batch_read_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_int]
    lib.voxel_count.restype = ctypes.c_long
    lib.voxel_count.argtypes = [ctypes.POINTER(ctypes.c_float),
                                ctypes.c_long, ctypes.c_float]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def batch_read_f32(paths: List[str], floats_per_file: int,
                   n_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Load many raw-float32 files concurrently.

    Returns (arena [n_files, floats_per_file] f32, counts [n_files] —
    floats actually read, -1 for unreadable files). Falls back to a
    sequential np.fromfile loop when the native lib is unavailable.
    """
    n = len(paths)
    arena = np.zeros((n, floats_per_file), np.float32)
    counts = np.zeros((n,), np.int64)
    lib = get_lib()
    if lib is not None and n > 0:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        lib.batch_read_f32(
            c_paths, n,
            arena.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            floats_per_file,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            n_threads)
        return arena, counts
    for i, p in enumerate(paths):  # fallback
        try:
            data = np.fromfile(p, dtype=np.float32,
                               count=floats_per_file)
            arena[i, : data.size] = data
            counts[i] = data.size
        except OSError:
            counts[i] = -1
    return arena, counts


def batch_read_velodyne(paths: List[str], max_points: int = 200_000,
                        n_threads: int = 8):
    """Concurrent KITTI scan loader -> list of (N_i, 3) xyz arrays."""
    arena, counts = batch_read_f32(paths, max_points * 4, n_threads)
    out = []
    for row, cnt in zip(arena, counts):
        if cnt < 0:
            out.append(None)
            continue
        n = int(cnt) // 4
        out.append(row[: n * 4].reshape(n, 4)[:, :3].copy())
    return out


def voxel_count(points: np.ndarray, leaf: float) -> int:
    """Occupied-voxel count (capacity sizing for voxel_downsample)."""
    points = np.ascontiguousarray(points[:, :3], np.float32)
    lib = get_lib()
    if lib is not None:
        return int(lib.voxel_count(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            points.shape[0], leaf))
    mn = points.min(axis=0)
    cells = np.floor((points - mn) / leaf).astype(np.int64)
    return len({tuple(c) for c in cells})
