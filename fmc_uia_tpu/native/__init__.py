"""ctypes bindings for the native preprocessing library.

Falls back gracefully (``available() == False``) when the shared object has
not been built; build with ``python -m fmc_uia_tpu.native.build``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfmcpreproc.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, u8p, ctypes.c_int,
                                       ctypes.c_int]
    lib.resize_nearest_u8.argtypes = list(lib.resize_bilinear_u8.argtypes)
    lib.resize_batch_u8.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Bilinear uint8 HWC resize via the native kernel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((dh, dw, ch) if img.ndim == 3 else (dh, dw), np.uint8)
    lib.resize_bilinear_u8(_as_u8p(img), sh, sw, ch, _as_u8p(out), dh, dw)
    return out


def resize_nearest(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((dh, dw, ch) if img.ndim == 3 else (dh, dw), np.uint8)
    lib.resize_nearest_u8(_as_u8p(img), sh, sw, ch, _as_u8p(out), dh, dw)
    return out


def resize_batch(images, dh: int, dw: int, bilinear: bool = True,
                 num_threads: int = 8) -> np.ndarray:
    """Resize a list of HWC uint8 images to one [N, dh, dw, C] batch with
    the native thread pool (single GIL release for the whole batch)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    n = len(images)
    ch = images[0].shape[2] if images[0].ndim == 3 else 1
    out = np.empty((n, dh, dw, ch), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * n)(*[_as_u8p(im) for im in images])
    shs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    sws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    lib.resize_batch_u8(ptrs, shs, sws, ch, _as_u8p(out), n, dh, dw,
                        1 if bilinear else 0, num_threads)
    if images[0].ndim == 2:
        return out[..., 0]
    return out
