"""ctypes bindings for the native data-plane kernels (native/tkg_pack.cpp).

Builds the shared library on first use (g++ -O3 -shared) into the cache dir;
every entry point has a numpy fallback, so the framework is fully functional
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "tkg_pack.cpp")
_CACHE = os.path.join(_REPO_ROOT, ".data_cache")
_SO = os.path.join(_CACHE, "libtkg_pack.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_CACHE, exist_ok=True)
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return _SO
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.tkg_count_quads.restype = ctypes.c_long
        lib.tkg_count_quads.argtypes = [ctypes.c_char_p]
        lib.tkg_parse_quads.restype = ctypes.c_long
        lib.tkg_parse_quads.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
        lib.tkg_pack_snapshots.restype = ctypes.c_int
        lib.tkg_filter_pairs.restype = ctypes.c_long
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def parse_quads(path: str) -> Optional[np.ndarray]:
    """Fast parse of a quadruple text file -> int64 [rows, 4], or None."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    n = lib.tkg_count_quads(path.encode())
    if n < 0:
        return None
    out = np.empty((n, 4), np.int64)
    got = lib.tkg_parse_quads(path.encode(), _ptr(out, ctypes.c_int64), n)
    if got < 0:
        return None
    return out[:got]


def pack_snapshots(quads: np.ndarray, time_pos: np.ndarray, T: int,
                   e_pad: int) -> Optional[Tuple[np.ndarray, ...]]:
    """Bucket quads into padded per-time arrays; None on fallback/overflow."""
    lib = get_lib()
    if lib is None:
        return None
    quads = np.ascontiguousarray(quads, np.int64)
    time_pos = np.ascontiguousarray(time_pos, np.int32)
    src = np.empty((T, e_pad), np.int32)
    rel = np.empty((T, e_pad), np.int32)
    dst = np.empty((T, e_pad), np.int32)
    emask = np.empty((T, e_pad), np.uint8)
    n_edges = np.empty((T,), np.int32)
    rc = lib.tkg_pack_snapshots(
        _ptr(quads, ctypes.c_int64), len(quads),
        _ptr(time_pos, ctypes.c_int32), len(time_pos), T, e_pad,
        _ptr(src, ctypes.c_int32), _ptr(rel, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32), _ptr(emask, ctypes.c_uint8),
        _ptr(n_edges, ctypes.c_int32))
    if rc != 0:
        return None
    return src, rel, dst, emask.astype(bool), n_edges


def filter_pairs(quads: np.ndarray, time_pos: np.ndarray, T: int, f_pad: int,
                 mode: str, r2: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    quads = np.ascontiguousarray(quads, np.int64)
    time_pos = np.ascontiguousarray(time_pos, np.int32)
    INT_PAD = np.iinfo(np.int32).max
    grp = np.full((T, f_pad), INT_PAD, np.int32)
    val = np.full((T, f_pad), INT_PAD, np.int32)
    rc = lib.tkg_filter_pairs(
        _ptr(quads, ctypes.c_int64), len(quads),
        _ptr(time_pos, ctypes.c_int32), len(time_pos), T, f_pad,
        0 if mode == "tail" else 1, r2,
        _ptr(grp, ctypes.c_int32), _ptr(val, ctypes.c_int32))
    if rc < 0:
        return None
    return grp, val
