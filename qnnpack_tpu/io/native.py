"""ctypes bindings for the native runtime library (native/).

Loads libqnnpack_tpu_native.so: C requantization oracles (test cross-checks
with true C int64/lrintf semantics) and the multithreaded C++ image
preprocessing pipeline.  Builds on demand with `make -C native` if the .so
is missing and a toolchain is available; all entry points have numpy
fallbacks so the Python framework works without the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils.logging import log_info, log_warning

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, os.pardir, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libqnnpack_tpu_native.so")

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-j"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log_warning("native library build failed: %s", e)
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _try_build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    for name in ("qt_requantize_q31", "qt_requantize_precise",
                 "qt_requantize_fp32", "qt_requantize_gemmlowp"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_size_t, i32p, ctypes.c_float, ctypes.c_uint8,
                       ctypes.c_uint8, ctypes.c_uint8, u8p]
        fn.restype = None
    lib.qt_resize_quantize_batch.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int]
    lib.qt_resize_quantize_batch.restype = None
    lib.qt_quantize.argtypes = [f32p, ctypes.c_size_t, u8p, ctypes.c_float,
                                ctypes.c_int]
    lib.qt_quantize.restype = None
    lib.qt_dequantize.argtypes = [u8p, ctypes.c_size_t, f32p, ctypes.c_float,
                                  ctypes.c_int]
    lib.qt_dequantize.restype = None
    _lib = lib
    log_info("loaded native library %s", _SO_PATH)
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _as_ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def c_requantize(scheme: str, x: np.ndarray, scale: float, zero_point: int,
                 qmin: int = 0, qmax: int = 255) -> np.ndarray:
    """Run the C oracle for `scheme` on an int32 array."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, dtype=np.int32)
    out = np.empty(x.shape, np.uint8)
    fn = getattr(lib, f"qt_requantize_{scheme}")
    fn(x.size, _as_ptr(x, ctypes.c_int32), np.float32(scale), zero_point,
       qmin, qmax, _as_ptr(out, ctypes.c_uint8))
    return out


def resize_quantize_batch(images: np.ndarray, out_hw, scale: float,
                          zero_point: int) -> np.ndarray:
    """Bilinear-resize float32 NHWC batch and quantize to uint8 NHWC.

    Falls back to a numpy implementation when the native library is absent.
    """
    images = np.ascontiguousarray(images, dtype=np.float32)
    b, h, w, c = images.shape
    oh, ow = out_hw
    lib = get_lib()
    if lib is not None:
        out = np.empty((b, oh, ow, c), np.uint8)
        lib.qt_resize_quantize_batch(
            _as_ptr(images, ctypes.c_float), b, h, w, c,
            _as_ptr(out, ctypes.c_uint8), oh, ow, np.float32(scale),
            zero_point)
        return out
    return _numpy_resize_quantize(images, out_hw, scale, zero_point)


def _numpy_resize_quantize(images, out_hw, scale, zero_point):
    b, h, w, c = images.shape
    oh, ow = out_hw
    fy = (np.arange(oh) * ((h - 1) / (oh - 1) if oh > 1 else 0.0))
    fx = (np.arange(ow) * ((w - 1) / (ow - 1) if ow > 1 else 0.0))
    y0 = fy.astype(np.int32)
    x0 = fx.astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0).astype(np.float32)[None, :, None, None]
    wx = (fx - x0).astype(np.float32)[None, None, :, None]
    p00 = images[:, y0][:, :, x0]
    p01 = images[:, y0][:, :, x1]
    p10 = images[:, y1][:, :, x0]
    p11 = images[:, y1][:, :, x1]
    top = p00 + (p01 - p00) * wx
    bot = p10 + (p11 - p10) * wx
    resized = top + (bot - top) * wy
    q = np.rint((resized / np.float32(scale)).astype(np.float32)) + zero_point
    return np.clip(q, 0, 255).astype(np.uint8)


def quantize(x: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    """float32 -> uint8 quantization (native if available)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(x.shape, np.uint8)
        lib.qt_quantize(_as_ptr(x, ctypes.c_float), x.size,
                        _as_ptr(out, ctypes.c_uint8), np.float32(scale),
                        zero_point)
        return out
    q = np.rint(x / np.float32(scale)) + zero_point
    return np.clip(q, 0, 255).astype(np.uint8)


def dequantize(x: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    """uint8 -> float32 (native if available)."""
    x = np.ascontiguousarray(x, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        out = np.empty(x.shape, np.float32)
        lib.qt_dequantize(_as_ptr(x, ctypes.c_uint8), x.size,
                          _as_ptr(out, ctypes.c_float), np.float32(scale),
                          zero_point)
        return out
    return (x.astype(np.int32) - zero_point).astype(np.float32) * np.float32(scale)
