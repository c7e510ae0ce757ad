"""ctypes bindings for the native scene-build kernels (voxcore.cpp).

Compiled lazily with g++ on first use and cached next to the source;
every entry point has a numpy fallback so the engine works without a
toolchain. See voxcore.cpp for what is native and why.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

__all__ = ["available", "build_leaves", "chebyshev"]

log = logging.getLogger("dust_tpu.native")
_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libvoxcore.so")
_SRC = os.path.join(_DIR, "voxcore.cpp")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO, _SRC, "-pthread"],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO)
        lib.voxcore_build_leaves.restype = ctypes.c_int64
        lib.voxcore_build_leaves.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.voxcore_chebyshev.restype = None
        lib.voxcore_chebyshev.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ]
        _LIB = lib
    except Exception as e:  # toolchain missing, sandboxed, ...
        log.info("voxcore native build unavailable (%s); using numpy paths", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def build_leaves(coords: np.ndarray, palette_idx: np.ndarray):
    """Native per-block occupancy + compacted materials.

    Returns (occupancy u64 (262144,), block_ptr u32 (262144,),
    materials u8 (n_unique,)) or None if native is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    palette_idx = np.ascontiguousarray(palette_idx, dtype=np.uint8)
    n = len(coords)
    occupancy = np.zeros(64 ** 3, dtype=np.uint64)
    block_ptr = np.zeros(64 ** 3, dtype=np.uint32)
    materials = np.zeros(max(n, 1), dtype=np.uint8)
    m = lib.voxcore_build_leaves(
        coords.ctypes.data, palette_idx.ctypes.data, n,
        occupancy.ctypes.data, block_ptr.ctypes.data, materials.ctypes.data,
    )
    if m < 0:
        raise ValueError("voxel coordinates out of the 256^3 extent")
    return occupancy, block_ptr, materials[:m].copy()


def chebyshev(occupied: np.ndarray, max_dist: int = 63):
    """Native chebyshev distance transform over a (64,64,64) bool field,
    or None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    occ = np.ascontiguousarray(occupied.reshape(-1), dtype=np.uint8)
    dist = np.zeros(64 ** 3, dtype=np.int32)
    lib.voxcore_chebyshev(occ.ctypes.data, dist.ctypes.data, max_dist)
    return dist.reshape(64, 64, 64)
