"""ctypes bindings for the native data engine (native/kdt_native.cpp).

Provides the C++ replacements for the reference's slideio/OpenCV stack
(SURVEY.md §2.4):

  * `NativeSlide`      — tiled-TIFF (SVS) region decode via libtiff
  * `extract_patch` /
    `extract_batch`    — OOB-safe read_block geometry + bilinear resample
                         + dihedral augmentation, multithreaded in C++
  * `tissue_mask_u8`   — HSV threshold mask

Everything degrades gracefully: `available()` is False when the shared
library hasn't been built (`make -C native`), and callers fall back to
the numpy implementations in data/wsi.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libkdt_native.so"),
    os.path.join(os.path.dirname(__file__), "libkdt_native.so"),
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            i64, i32, u8p = ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)
            lib.kdt_extract_patch.restype = ctypes.c_int
            lib.kdt_extract_patch.argtypes = [
                u8p, i64, i64, i64, i64, i64, i64,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_int, u8p,
            ]
            lib.kdt_extract_batch.restype = ctypes.c_int
            lib.kdt_extract_batch.argtypes = [
                u8p, i64, i64,
                ctypes.POINTER(i64), ctypes.POINTER(i64), ctypes.POINTER(i64),
                ctypes.POINTER(i32), i64, i64,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_int, u8p,
            ]
            lib.kdt_tissue_mask.restype = ctypes.c_int
            lib.kdt_tissue_mask.argtypes = [
                u8p, i64, ctypes.c_float, ctypes.c_float, u8p
            ]
            lib.kdt_tiff_open.restype = ctypes.c_void_p
            lib.kdt_tiff_open.argtypes = [ctypes.c_char_p]
            lib.kdt_tiff_close.argtypes = [ctypes.c_void_p]
            lib.kdt_tiff_size.restype = ctypes.c_int
            lib.kdt_tiff_size.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(i64), ctypes.POINTER(i64)
            ]
            lib.kdt_tiff_read_region.restype = ctypes.c_int
            lib.kdt_tiff_read_region.argtypes = [
                ctypes.c_void_p, i64, i64, i64, i64, i64, i64, u8p,
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def extract_patch(
    image: np.ndarray,
    x: int,
    y: int,
    region: int,
    out_size: int,
    *,
    fill=(242, 243, 242),
    aug_index: int = 0,
) -> np.ndarray:
    """read_block geometry on an in-RAM uint8 HWC image -> uint8 patch."""
    lib = _load()
    assert lib is not None, "native engine not built (make -C native)"
    image = np.ascontiguousarray(image, np.uint8)
    out = np.empty((out_size, out_size, 3), np.uint8)
    rc = lib.kdt_extract_patch(
        _u8p(image), image.shape[0], image.shape[1],
        int(x), int(y), int(region), int(out_size),
        fill[0], fill[1], fill[2], int(aug_index), _u8p(out),
    )
    assert rc == 0, rc
    return out


def extract_batch(
    image: np.ndarray,
    xs,
    ys,
    regions,
    out_size: int,
    *,
    fill=(242, 243, 242),
    aug=None,
    threads: int = 8,
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native engine not built (make -C native)"
    image = np.ascontiguousarray(image, np.uint8)
    xs = np.ascontiguousarray(xs, np.int64)
    ys = np.ascontiguousarray(ys, np.int64)
    regions = np.ascontiguousarray(regions, np.int64)
    n = len(xs)
    aug_arr = np.ascontiguousarray(
        aug if aug is not None else np.zeros(n), np.int32
    )
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.kdt_extract_batch(
        _u8p(image), image.shape[0], image.shape[1],
        xs.ctypes.data_as(i64p), ys.ctypes.data_as(i64p),
        regions.ctypes.data_as(i64p), aug_arr.ctypes.data_as(i32p),
        n, int(out_size), fill[0], fill[1], fill[2], int(threads), _u8p(out),
    )
    assert rc == 0, rc
    return out


def tissue_mask_u8(
    image: np.ndarray, hue_min: float = 0.5, sat_min: float = 0.02
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native engine not built (make -C native)"
    image = np.ascontiguousarray(image, np.uint8)
    h, w = image.shape[:2]
    out = np.empty((h, w), np.uint8)
    rc = lib.kdt_tissue_mask(_u8p(image), h * w, hue_min, sat_min, _u8p(out))
    assert rc == 0, rc
    return out.astype(bool)


class NativeSlide:
    """Tiled-TIFF/SVS slide via the in-repo C++ reader — the slideio
    replacement. Conforms to the data/wsi.py `Slide` protocol."""

    def __init__(self, path: str):
        lib = _load()
        assert lib is not None, "native engine not built (make -C native)"
        self._lib = lib
        self._handle = lib.kdt_tiff_open(path.encode())
        if not self._handle:
            raise IOError(f"could not open TIFF {path}")
        w = ctypes.c_int64()
        h = ctypes.c_int64()
        lib.kdt_tiff_size(self._handle, ctypes.byref(w), ctypes.byref(h))
        self._size = (w.value, h.value)

    @property
    def size(self) -> Tuple[int, int]:
        return self._size

    def read_region(self, x, y, w, h, out_w, out_h) -> np.ndarray:
        out = np.empty((out_h, out_w, 3), np.uint8)
        rc = self._lib.kdt_tiff_read_region(
            self._handle, int(x), int(y), int(w), int(h),
            int(out_w), int(out_h), _u8p(out),
        )
        if rc != 0:
            raise IOError(f"tiff read failed rc={rc}")
        return out

    def close(self):
        if self._handle:
            self._lib.kdt_tiff_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
