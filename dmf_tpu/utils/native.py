"""ctypes bindings for the native host runtime (native/dmf_native.cpp).

Auto-builds the shared library with g++ on first use if missing, and falls
back to numpy implementations when no toolchain is available — the
framework never hard-depends on the native path, it just gets faster with
it (threaded exact Nyul fit, parallel batch gather).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdmf_native.so")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "dmf_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if lib.dmf_native_version() != 1:
        return None

    i64 = ctypes.c_int64
    lib.nyul_fit.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, i64, i64, i64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    lib.nyul_fit.restype = ctypes.c_int
    lib.percentiles.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.percentiles.restype = ctypes.c_int
    lib.gather_rows.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(i64), i64, i64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.gather_rows.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def nyul_fit(
    images: np.ndarray, landmarks: np.ndarray, n_threads: int = 0
) -> Optional[np.ndarray]:
    """Native threaded Nyul fit: (N, H, W, C) -> (C, L), or None if no lib."""
    lib = load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, dtype=np.float32)
    landmarks = np.ascontiguousarray(landmarks, dtype=np.float64)
    n, h, w, c = images.shape
    L = len(landmarks)
    out = np.zeros((c, L), np.float64)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    rc = lib.nyul_fit(
        _fptr(images), n, h, w, c, _dptr(landmarks), L, _dptr(out), n_threads
    )
    return out if rc == 0 else None


def percentiles(data: np.ndarray, q: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data.ravel(), dtype=np.float32)
    q = np.ascontiguousarray(q, dtype=np.float64)
    out = np.zeros(len(q), np.float64)
    rc = lib.percentiles(_fptr(data), data.size, _dptr(q), len(q), _dptr(out))
    return out if rc == 0 else None


def gather_rows(
    src: np.ndarray, indices: np.ndarray, n_threads: int = 0
) -> Optional[np.ndarray]:
    """Parallel ``src[indices]`` for 2D+ float32 arrays (batch assembly)."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(indices),) + src.shape[1:], np.float32)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    rc = lib.gather_rows(
        _fptr(src),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), row_elems, _fptr(out), n_threads,
    )
    return out if rc == 0 else None
