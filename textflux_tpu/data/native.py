"""ctypes bindings for the native C++ data-path kernels (native/
textflux_native.cpp), with automatic compile-on-first-use and transparent
numpy/cv2 fallbacks when no toolchain is present."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "textflux_native.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libtextflux_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.fill_poly.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p,
                                  ctypes.c_int, ctypes.c_uint8]
        lib.dilate3x3.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.erode3x3.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.normalize_pm1.argtypes = [u8p, f32p, ctypes.c_int64]
        lib.normalize_01.argtypes = [u8p, f32p, ctypes.c_int64]
        _lib = lib
        return _lib


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fill_poly(mask: np.ndarray, polygon: np.ndarray, value: int = 255) -> np.ndarray:
    """In-place polygon fill on a (H, W) uint8 mask."""
    lib = get_lib()
    pts = np.ascontiguousarray(polygon, np.float32)
    if lib is None:
        try:
            import cv2
        except Exception as e:  # no native lib AND no cv2: fail loudly — a
            # silently empty mask makes every downstream edit a no-op that
            # still "succeeds"
            raise RuntimeError(
                "polygon fill needs the native kernel (g++ to build "
                "native/textflux_native.cpp) or cv2; neither is available"
            ) from e
        cv2.fillPoly(mask, [pts.astype(np.int32)], int(value))
        return mask
    assert mask.dtype == np.uint8 and mask.flags.c_contiguous
    lib.fill_poly(_u8(mask), mask.shape[0], mask.shape[1], _f32(pts),
                  len(pts), value)
    return mask


def dilate(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        import cv2

        return cv2.dilate(mask, np.ones((3, 3), np.uint8), iterations=iterations)
    # copy: the C kernel writes in place, but the cv2 fallback returns a
    # fresh array — ascontiguousarray alone aliases an already-contiguous
    # input, silently mutating the caller's mask only on hosts with g++
    out = np.ascontiguousarray(mask).copy()
    lib.dilate3x3(_u8(out), out.shape[0], out.shape[1], iterations)
    return out


def erode(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        import cv2

        return cv2.erode(mask, np.ones((3, 3), np.uint8), iterations=iterations)
    out = np.ascontiguousarray(mask).copy()   # see dilate: no caller aliasing
    lib.erode3x3(_u8(out), out.shape[0], out.shape[1], iterations)
    return out


def normalize_pm1(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1]."""
    lib = get_lib()
    src = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return src.astype(np.float32) / 127.5 - 1.0
    out = np.empty(src.shape, np.float32)
    lib.normalize_pm1(_u8(src), _f32(out), src.size)
    return out


def normalize_01(img: np.ndarray) -> np.ndarray:
    lib = get_lib()
    src = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return src.astype(np.float32) / 255.0
    out = np.empty(src.shape, np.float32)
    lib.normalize_01(_u8(src), _f32(out), src.size)
    return out
