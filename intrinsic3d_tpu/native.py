"""ctypes binding for the native host runtime (native/i3d_host.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp) and exposes the
packed-key / hash-lookup / neighbor-table primitives. Every entry point has a
vectorized-numpy fallback in grid/voxel_grid.py — the native path exists
because topology rebuilds at level boundaries are a host hot path (the
reference's equivalent work lived in its C++ voxel hash map,
``libintrinsic3d/src/sparse_voxel_grid.cpp``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger("intrinsic3d")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "i3d_host.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libi3d_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain, read-only fs, ...
        log.debug("native build failed (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.debug("native load failed: %s", e)
            return None
        i64 = ctypes.c_int64
        p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.i3d_pack_coords.argtypes = [p32, i64, p64]
        lib.i3d_neighbor_table.argtypes = [p32, i64, p32, i64, p32]
        lib.i3d_find_indices.argtypes = [p32, i64, p32, i64, p32]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def pack_coords(coords: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    out = np.empty(len(coords), np.int64)
    lib.i3d_pack_coords(coords, len(coords), out)
    return out


def neighbor_table(coords: np.ndarray, offsets: np.ndarray) -> Optional[np.ndarray]:
    """Gather-index table [n, s] (−1 absent) in the given coord order."""
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    out = np.empty((len(coords), len(offsets)), np.int32)
    lib.i3d_neighbor_table(coords, len(coords), offsets, len(offsets), out)
    return out


def find_indices(coords: np.ndarray, queries: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    q = np.ascontiguousarray(queries, np.int32).reshape(-1, 3)
    out = np.empty(len(q), np.int32)
    lib.i3d_find_indices(coords, len(coords), q, len(q), out)
    return out
