"""ctypes loader for the native host library (csrc/libfabric_host.so).

Builds on first use if a compiler is available; every wrapped op has a pure
numpy fallback in fabric_tpu.utils.image, so absence of a toolchain only
costs speed, never correctness.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libfabric_host.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """The loaded CDLL, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resize_bilinear_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
        lib.normalize_resize_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            f32p, ctypes.c_int, ctypes.c_int]
        lib.stretch_8bit_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_double, ctypes.c_double, u8p]
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray | None:
    """(H, W) float32 -> (oh, ow) float32; None if native lib missing."""
    lib = get_lib()
    if lib is None or img.ndim != 2:
        return None
    src = np.ascontiguousarray(img, np.float32)
    dst = np.empty((oh, ow), np.float32)
    lib.resize_bilinear_f32(_fptr(src), src.shape[0], src.shape[1],
                            _fptr(dst), oh, ow)
    return dst


def normalize_resize(img: np.ndarray, mean: float, std: float,
                     oh: int, ow: int) -> np.ndarray | None:
    """Fused (x-mean)/std + resize of a (H, W) float32 band."""
    lib = get_lib()
    if lib is None or img.ndim != 2:
        return None
    src = np.ascontiguousarray(img, np.float32)
    dst = np.empty((oh, ow), np.float32)
    lib.normalize_resize_f32(_fptr(src), src.shape[0], src.shape[1],
                             float(mean), float(std), _fptr(dst), oh, ow)
    return dst


def stretch_8bit(band: np.ndarray, lower: float = 2,
                 higher: float = 98) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(band, np.float32)
    dst = np.empty(src.shape, np.uint8)
    lib.stretch_8bit_f32(_fptr(src), src.size, float(lower), float(higher),
                         dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dst
