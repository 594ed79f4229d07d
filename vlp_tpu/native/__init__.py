"""ctypes bindings for the native preprocessing library.

Loads ``libvlp_native.so`` (built via ``make -C vlp_tpu/native``; the loader
also builds it on demand when g++ is available). All entry points degrade to
None when the library can't be built so pure-Python paths keep working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvlp_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_SO)
    except Exception as e:
        logger.warning("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.vlp_preprocess_image.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int, u8p]
    lib.vlp_preprocess_image.restype = None
    lib.vlp_preprocess_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, u8p,
        ctypes.c_int]
    lib.vlp_preprocess_batch.restype = None
    _lib = lib
    logger.info("native preprocessing library loaded (%s)", _SO)
    return _lib


def preprocess_image_native(img: np.ndarray, out_size: int = 224,
                            crop: bool = False, max_crop_ratio: float = 0.05,
                            equalize: bool = True) -> Optional[np.ndarray]:
    """HWC (or HW) uint8 -> [out_size, out_size] uint8, or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    out = np.empty((out_size, out_size), np.uint8)
    lib.vlp_preprocess_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out_size, int(crop), float(max_crop_ratio), int(equalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def preprocess_batch_native(imgs: np.ndarray, out_size: int = 224,
                            crop: bool = False, max_crop_ratio: float = 0.05,
                            equalize: bool = True,
                            num_threads: Optional[int] = None
                            ) -> Optional[np.ndarray]:
    """[N,H,W,C] uint8 (uniform shapes) -> [N,S,S] uint8 via thread pool."""
    lib = get_lib()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    out = np.empty((n, out_size, out_size), np.uint8)
    threads = num_threads or min(8, os.cpu_count() or 1)
    lib.vlp_preprocess_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, c,
        out_size, int(crop), float(max_crop_ratio), int(equalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out
