"""ctypes binding for the native data-loading runtime (loader.cc).

Builds lazily via make on first use; every entry point has a pure-Python
fallback so the framework works without a toolchain. The C++ decode path
releases the GIL inside the ctypes call, so the threaded batch decoder gives
true parallel decode from Python (the reference leaned on torch's C++
DataLoader workers for this, train.py:51).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmvdf_loader.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.mvdf_decode.restype = ctypes.c_int
    lib.mvdf_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mvdf_decode_batch.restype = ctypes.c_int
    lib.mvdf_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    paths: Sequence[str],
    out_h: int,
    out_w: int,
    out_c: int = 3,
    white_composite: bool = True,
    n_threads: int = 4,
) -> np.ndarray:
    """Decode a batch of image files to (N, H, W, C) float32 in [0,1].

    Raises RuntimeError if the native library is unavailable or any file
    fails — callers fall back to the Python path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, out_c), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.mvdf_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h,
        out_w,
        out_c,
        1 if white_composite else 0,
        n_threads,
    )
    if failures:
        raise RuntimeError(f"native loader failed on {failures}/{n} files")
    return out
