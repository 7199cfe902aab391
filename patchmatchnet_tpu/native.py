"""ctypes loader for the native host-ops library (native/hostops.cpp).

Builds on demand with `make` (g++) the first time it is used; every caller
has a pure-Python/numpy fallback, so the framework works without a
toolchain. Set PATCHMATCHNET_TPU_NO_NATIVE=1 to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("PATCHMATCHNET_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64

        lib.resize_bilinear_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
        lib.resize_bilinear_batch_f32.argtypes = [
            f32p, i64, i64, i64, i64, f32p, i64, i64, ctypes.c_int,
        ]
        lib.u8_to_f32_scale.argtypes = [u8p, i64, f32p]
        lib.flip_vertical_f32.argtypes = [f32p, i64, i64, f32p]
        lib.hostops_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def resize_bilinear(image: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Native bilinear resize of float32 (H, W[, C]); None if unavailable."""
    lib = get_lib()
    if lib is None or image.dtype != np.float32:
        return None
    squeeze = image.ndim == 2
    img = np.ascontiguousarray(image[:, :, None] if squeeze else image)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    lib.resize_bilinear_f32(img, h, w, c, out, out_h, out_w)
    return out[:, :, 0] if squeeze else out


def resize_bilinear_batch(
    images: np.ndarray, out_h: int, out_w: int, num_threads: int = 4
) -> Optional[np.ndarray]:
    """Native threaded batch resize of float32 [N, H, W, C]; None if unavailable."""
    lib = get_lib()
    if lib is None or images.dtype != np.float32 or images.ndim != 4:
        return None
    imgs = np.ascontiguousarray(images)
    n, h, w, c = imgs.shape
    out = np.empty((n, out_h, out_w, c), np.float32)
    lib.resize_bilinear_batch_f32(imgs, n, h, w, c, out, out_h, out_w, num_threads)
    return out


def u8_to_f32(image: np.ndarray) -> Optional[np.ndarray]:
    """Native uint8 -> [0,1] float32; None if unavailable."""
    lib = get_lib()
    if lib is None or image.dtype != np.uint8:
        return None
    img = np.ascontiguousarray(image)
    out = np.empty(img.shape, np.float32)
    lib.u8_to_f32_scale(img.reshape(-1), img.size, out.reshape(-1))
    return out
