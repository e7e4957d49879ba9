"""ctypes bindings for the native prefetch ring (``native/prefetch.cpp``).

Replaces the reference's optional NVIDIA DALI loader slot
(``packages/{fastdvdnet,DDnet}/dataloaders.py``) with a TPU-appropriate
design: the device synthesizes augmentation/noise, the host only streams raw
``.npy`` bytes, overlapped with train steps by a C++ worker pool. Builds on
first use (``make -C native``); falls back to synchronous reads when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
from typing import Iterator

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libprefetch.so")

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.prefetch_create.restype = ctypes.c_void_p
    lib.prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.prefetch_next.restype = ctypes.c_int64
    lib.prefetch_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def iter_npy_prefetched(
    paths: list[str], workers: int = 2, capacity: int = 4
) -> Iterator[np.ndarray]:
    """Yield arrays from ``.npy`` files in order, reads overlapped by the
    native worker pool (synchronous fallback without a toolchain)."""
    lib = _load_library()
    if lib is None:
        for p in paths:
            yield np.load(p)
        return

    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    ring = lib.prefetch_create(arr, len(paths), workers, capacity)
    try:
        while True:
            data_ptr = ctypes.POINTER(ctypes.c_uint8)()
            size = lib.prefetch_next(ring, ctypes.byref(data_ptr))
            if size < 0:
                break
            raw = ctypes.string_at(data_ptr, size)
            yield np.load(io.BytesIO(raw))
    finally:
        lib.prefetch_destroy(ring)
