"""ctypes bindings for the native C++ batch assembler (native/loader.cpp).

Builds the shared library on first use (g++ is part of the toolchain; no
pybind11 in this image, so the binding is plain ctypes over a C ABI).  The
pipeline falls back to vectorized NumPy when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvitgan_loader.so")
_BUILD_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> None:
    src = os.path.join(_NATIVE_DIR, "loader.cpp")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src,
         "-o", _LIB_PATH],
        check=True, capture_output=True,
    )


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_NATIVE_DIR, "loader.cpp")
        stale = (os.path.exists(src) and os.path.exists(_LIB_PATH)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
        if not os.path.exists(_LIB_PATH) or stale:
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gather_normalize.restype = ctypes.c_int
        lib.gather_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.normalize_u8.restype = ctypes.c_int
        lib.normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.resize_bilinear_u8.restype = ctypes.c_int
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _LIB = lib
        return lib


def native_resize_bilinear(images_u8: np.ndarray, out_h: int, out_w: int,
                           num_threads: Optional[int] = None) -> np.ndarray:
    """Threaded PIL-semantics bilinear resize (native/loader.cpp)."""
    lib = load_library()
    images_u8 = np.ascontiguousarray(images_u8, np.uint8)
    n, h, w, c = images_u8.shape
    out = np.empty((n, out_h, out_w, c), np.uint8)
    rc = lib.resize_bilinear_u8(
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads or max(1, os.cpu_count() or 1),
    )
    if rc != 0:
        raise RuntimeError(f"native resize_bilinear_u8 failed with code {rc}")
    return out


class NativeBatcher:
    """Fused gather+normalize+flip over all host cores."""

    def __init__(self, num_threads: Optional[int] = None):
        self.lib = load_library()
        self.num_threads = num_threads or max(1, os.cpu_count() or 1)

    def gather_normalize(self, images_u8: np.ndarray, indices: np.ndarray,
                         flip: Optional[np.ndarray] = None) -> np.ndarray:
        assert images_u8.dtype == np.uint8 and images_u8.ndim == 4
        images_u8 = np.ascontiguousarray(images_u8)
        indices = np.ascontiguousarray(indices, np.int64)
        # The C side dereferences images+idx*stride unchecked (it never sees
        # N) — match the NumPy fallback's IndexError instead of reading
        # out-of-bounds host memory.
        if len(indices) and (indices.min() < 0 or indices.max() >= len(images_u8)):
            raise IndexError(
                f"gather indices out of range [0, {len(images_u8)}): "
                f"min {indices.min()}, max {indices.max()}")
        b = len(indices)
        _, h, w, c = images_u8.shape
        out = np.empty((b, h, w, c), np.float32)
        flip_ptr = None
        if flip is not None:
            flip = np.ascontiguousarray(flip, np.uint8)
            flip_ptr = flip.ctypes.data_as(ctypes.c_void_p)
        rc = self.lib.gather_normalize(
            images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b, h, w, c, flip_ptr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_threads,
        )
        if rc != 0:
            raise RuntimeError(f"native gather_normalize failed with code {rc}")
        return out
