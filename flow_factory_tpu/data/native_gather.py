"""ctypes bindings for the native batch-gather kernel (native/gather.cpp).

Builds ``libffgather.so`` on first use (g++, cached next to the source) and
falls back to numpy fancy indexing when a toolchain is unavailable — the
fast path is an optimization, never a requirement.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src_dir = _native_dir()
        src = os.path.join(src_dir, "gather.cpp")
        so = os.path.join(src_dir, "libffgather.so")
        if not os.path.exists(src):
            return None
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread", src, "-o", so],
                    check=True, capture_output=True, timeout=120,
                )
                logger.info("Built native gather kernel: %s", so)
            except Exception as e:
                logger.info("Native gather unavailable (%s); using numpy fallback", e)
                return None
        try:
            lib = ctypes.CDLL(so)
            lib.ff_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.ff_gather_rows.restype = None
            _LIB = lib
        except OSError as e:
            logger.info("Native gather load failed (%s); using numpy fallback", e)
    return _LIB


def gather_rows(arr: np.ndarray, indices, n_threads: int = 0) -> np.ndarray:
    """out[i] = arr[indices[i]] — threaded memcpy when the native lib loads.

    ``arr`` may be a np.memmap (the cache mmap); rows must be C-contiguous.
    """
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    lib = _load()
    row_shape = arr.shape[1:]
    row_bytes = int(np.prod(row_shape)) * arr.dtype.itemsize
    if lib is None or row_bytes == 0 or arr.ndim < 2 or not _c_contiguous_rows(arr):
        return np.ascontiguousarray(arr[idx])
    out = np.empty((len(idx), *row_shape), dtype=arr.dtype)
    src = np.ascontiguousarray(arr) if not arr.flags["C_CONTIGUOUS"] else arr
    lib.ff_gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(idx)),
        ctypes.c_int64(row_bytes),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(n_threads),
    )
    return out


def _c_contiguous_rows(arr: np.ndarray) -> bool:
    return arr.flags["C_CONTIGUOUS"]


def native_available() -> bool:
    return _load() is not None
