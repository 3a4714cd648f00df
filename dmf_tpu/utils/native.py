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


def _bind_loader(lib) -> bool:
    """Register loader_* signatures once; returns whether the loaded
    library exports the prefetch-loader surface."""
    if getattr(lib, "_loader_bound", False):
        return True
    if not hasattr(lib, "loader_create"):
        return False
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    lib.loader_create.argtypes = [
        ctypes.POINTER(fp), ctypes.POINTER(i64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        i64, i64, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(fp),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(i64),
    ]
    lib.loader_next.restype = i64
    lib.loader_release.argtypes = [ctypes.c_void_p, i64]
    lib.loader_release.restype = None
    lib.loader_new_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.loader_new_epoch.restype = None
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.restype = None
    lib._loader_bound = True
    return True


class NativeBatchLoader:
    """Threaded prefetching batch loader over K aligned in-memory arrays.

    The native analogue of the reference's DataLoader worker pool
    (num_workers=11, prepare_single_model.py:140-141): C++ threads gather
    shuffled batches into a ring of pre-allocated slots ahead of the
    consumer; delivery is in batch order.  Yields dicts of numpy views —
    valid only until the next iteration step (the slot is recycled), so
    consumers must copy or ``jax.device_put`` before advancing.

    ``arrays`` maps names to (N, ...) float arrays; ``labels`` is an
    optional (N,) int array under the "labels" key.  Check
    ``NativeBatchLoader.available()`` and fall back to
    ``data.pipeline.iterate_batches`` when False.
    """

    def __init__(self, arrays: dict, labels: Optional[np.ndarray],
                 batch: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, ring_slots: int = 4,
                 n_threads: int = 0):
        lib = load()
        if lib is None or not _bind_loader(lib):
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        # keep references so the arrays outlive the C loader
        self._arrays = {k: np.ascontiguousarray(v, np.float32)
                        for k, v in arrays.items()}
        self._labels = (np.ascontiguousarray(labels, np.int32)
                        if labels is not None else None)
        self._names = list(self._arrays)
        ns = {len(v) for v in self._arrays.values()}
        if self._labels is not None:
            ns.add(len(self._labels))
        if len(ns) != 1:
            raise ValueError("misaligned arrays")
        self.n = ns.pop()
        self.batch = int(batch)
        self.shapes = {k: v.shape[1:] for k, v in self._arrays.items()}

        K = len(self._names)
        fp = ctypes.POINTER(ctypes.c_float)
        arr_ptrs = (fp * K)(*[_fptr(self._arrays[k]) for k in self._names])
        elems = (ctypes.c_int64 * K)(
            *[int(np.prod(self.shapes[k])) for k in self._names])
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 11)
        self._h = lib.loader_create(
            arr_ptrs, elems, K,
            self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if self._labels is not None
            else ctypes.POINTER(ctypes.c_int32)(),
            self.n, self.batch, int(shuffle), seed, int(drop_last),
            ring_slots, n_threads,
        )
        if not self._h:
            raise RuntimeError("loader_create failed")
        # epoch generation: stale releases from generators abandoned across
        # a new_epoch() must be ignored (the reseed already freed every
        # slot natively, and workers may have re-claimed this one)
        self._gen = 0

    @staticmethod
    def available() -> bool:
        lib = load()
        return lib is not None and _bind_loader(lib)

    def new_epoch(self, seed: int) -> None:
        self._gen += 1
        self._lib.loader_new_epoch(self._h, seed)

    def __iter__(self):
        K = len(self._names)
        fp = ctypes.POINTER(ctypes.c_float)
        while True:
            outs = (fp * K)()
            pl = ctypes.POINTER(ctypes.c_int32)()
            slot = ctypes.c_int64(0)
            size = self._lib.loader_next(self._h, outs, ctypes.byref(pl),
                                         ctypes.byref(slot))
            if size == 0:
                return
            gen = self._gen
            batch = {}
            for a, name in enumerate(self._names):
                shape = self.shapes[name]
                n_el = int(np.prod(shape))
                flat = np.ctypeslib.as_array(outs[a],
                                             shape=(self.batch * n_el,))
                batch[name] = flat[: size * n_el].reshape((size,) + shape)
            if self._labels is not None:
                lab = np.ctypeslib.as_array(pl, shape=(self.batch,))
                batch["labels"] = lab[:size]
            try:
                yield batch
            finally:
                # slot buffers are recycled after release; consumers must
                # have copied/uploaded by the next iteration step.  Guards:
                # the handle (close() may have run while this generator was
                # suspended — releasing into a destroyed loader would
                # dereference NULL), and the epoch generation (a generator
                # finalized after new_epoch() must not free a slot the new
                # epoch's workers may already have re-claimed).
                if self._h and gen == self._gen:
                    self._lib.loader_release(self._h, slot.value)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
