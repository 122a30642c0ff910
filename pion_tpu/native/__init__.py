"""ctypes bindings for the native snapshot runtime (libsnapio.so).

Auto-builds the shared library with `make` on first import if the compiled
artifact is missing (the toolchain is baked into the image).  All entry
points degrade gracefully: callers fall back to numpy/zlib when the native
library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsnapio.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.snap_compress.restype = ctypes.c_int64
    lib.snap_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32]
    lib.snap_decompress.restype = ctypes.c_int64
    lib.snap_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32]
    lib.snap_diff_norms.restype = None
    lib.snap_diff_norms.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int32]
    _lib = lib
    return lib


def n_threads() -> int:
    return max(1, os.cpu_count() or 1)


def compress(data: np.ndarray, level: int = 1) -> Optional[bytes]:
    """Multithreaded chunked deflate of a contiguous array; None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(data).view(np.uint8).ravel()
    cap = raw.nbytes + raw.nbytes // 4 + (1 << 20)
    out = np.empty(cap, dtype=np.uint8)
    n = lib.snap_compress(raw.ctypes.data, raw.nbytes, out.ctypes.data,
                          cap, level, n_threads())
    if n < 0:
        return None
    return out[:n].tobytes()


def decompress(blob: bytes, raw_nbytes: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(raw_nbytes, dtype=np.uint8)
    n = lib.snap_decompress(src.ctypes.data, src.nbytes, out.ctypes.data,
                            raw_nbytes, n_threads())
    if n != raw_nbytes:
        return None
    return out


def diff_norms(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Per-variable [L1, L2, max] of (a-b); a,b shaped (nvar, ...)."""
    lib = get_lib()
    if lib is None:
        return None
    a64 = np.ascontiguousarray(a, dtype=np.float64).reshape(a.shape[0], -1)
    b64 = np.ascontiguousarray(b, dtype=np.float64).reshape(b.shape[0], -1)
    out = np.empty((a64.shape[0], 3), dtype=np.float64)
    lib.snap_diff_norms(a64.ctypes.data, b64.ctypes.data, a64.shape[0],
                        a64.shape[1], out.ctypes.data, n_threads())
    return out
