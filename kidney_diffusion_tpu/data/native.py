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
            try:
                _bind(lib)
            except AttributeError as e:
                # a stale .so from before an API addition: degrade to
                # "native unavailable" (the documented contract of
                # available()) instead of crashing every open_slide
                print(
                    f"[native] {path} is missing symbol {e}; it predates "
                    "this source tree — rebuild with `make -C native` to "
                    "re-enable the native data engine", flush=True,
                )
                return None
            _lib = lib
            return lib
    return None


def _bind(lib) -> None:
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
    lib.kdt_tiff_compression.restype = ctypes.c_int
    lib.kdt_tiff_compression.argtypes = [ctypes.c_void_p]
    lib.kdt_tiff_tile_dims.restype = ctypes.c_int
    lib.kdt_tiff_tile_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(i64), ctypes.POINTER(i64)
    ]
    lib.kdt_tiff_read_raw_tile.restype = i64
    lib.kdt_tiff_read_raw_tile.argtypes = [
        ctypes.c_void_p, i64, i64, u8p, i64
    ]


class UnsupportedSlideError(IOError):
    """The slide's codec cannot be decoded by ANY available backend —
    raised instead of silently falling through to a decoder that would
    also fail (e.g. whole-image PIL on a JPEG2000 SVS)."""


# Aperio JPEG2000 compression codes (slideio decodes these through its
# bundled openjpeg; /root/reference/patient_dataset.py:118)
COMPRESSION_APERIO_J2K_YCBCR = 33003
COMPRESSION_APERIO_J2K_RGB = 33005
_J2K_COMPRESSIONS = (COMPRESSION_APERIO_J2K_YCBCR, COMPRESSION_APERIO_J2K_RGB)


def pil_j2k_available() -> bool:
    try:
        from PIL import features

        return bool(features.check("jpg_2000"))
    except Exception:
        return False


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
    replacement. Conforms to the data/wsi.py `Slide` protocol.

    Codec support matrix (README "WSI support"):
      * uncompressed / JPEG tiled TIFF (modern Aperio SVS) — pure libtiff
      * striped TIFF — libtiff whole-directory decode
      * Aperio JPEG2000 SVS (compression 33003/33005) — raw tiles fetched
        in C++, codestreams decoded via Pillow/openjpeg (requires PIL
        built with jpg_2000; else a clear UnsupportedSlideError)
    """

    def __init__(self, path: str, *, j2k_tile_cache: int = 64):
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
        self._compression = lib.kdt_tiff_compression(self._handle)
        self._j2k = self._compression in _J2K_COMPRESSIONS
        if self._j2k:
            if not pil_j2k_available():
                comp = self._compression
                self.close()
                raise UnsupportedSlideError(
                    f"unsupported: JPEG2000-compressed Aperio SVS "
                    f"(compression {comp}) at {path} — no J2K decoder "
                    f"available (Pillow lacks jpg_2000 support)"
                )
            tw = ctypes.c_int64()
            th = ctypes.c_int64()
            lib.kdt_tiff_tile_dims(self._handle, ctypes.byref(tw), ctypes.byref(th))
            if tw.value <= 0:
                self.close()
                raise UnsupportedSlideError(
                    f"unsupported: non-tiled JPEG2000 TIFF at {path}"
                )
            self._tile_dims = (tw.value, th.value)
            self._tile_cache: dict = {}  # (tx, ty) -> decoded RGB8 tile
            self._tile_cache_cap = j2k_tile_cache

    @property
    def size(self) -> Tuple[int, int]:
        return self._size

    def read_region(self, x, y, w, h, out_w, out_h) -> np.ndarray:
        if self._j2k:
            return self._read_region_j2k(x, y, w, h, out_w, out_h)
        out = np.empty((out_h, out_w, 3), np.uint8)
        rc = self._lib.kdt_tiff_read_region(
            self._handle, int(x), int(y), int(w), int(h),
            int(out_w), int(out_h), _u8p(out),
        )
        if rc != 0:
            raise IOError(f"tiff read failed rc={rc}")
        return out

    # ---- Aperio J2K path --------------------------------------------------

    def _decode_j2k_tile(self, tx: int, ty: int) -> np.ndarray:
        """Decode (and cache) the full tile whose top-left is (tx, ty)."""
        key = (tx, ty)
        cached = self._tile_cache.get(key)
        if cached is not None:
            return cached
        import io

        from PIL import Image

        tw, th = self._tile_dims
        cap = tw * th * 3 + (1 << 16)
        buf = np.empty(cap, np.uint8)
        n = self._lib.kdt_tiff_read_raw_tile(self._handle, tx, ty, _u8p(buf), cap)
        if n <= 0:
            raise IOError(f"raw J2K tile read failed at ({tx}, {ty}) rc={n}")
        img = Image.open(io.BytesIO(buf[:n].tobytes()))
        img.load()
        tile = np.asarray(img)
        if tile.ndim == 2:
            tile = np.stack([tile] * 3, axis=-1)
        tile = tile[..., :3]
        if self._compression == COMPRESSION_APERIO_J2K_YCBCR:
            # 33003 codestreams carry YCbCr planes with the RGB transform
            # done OUTSIDE the codestream (no MCT flag) — convert here
            # (full-range BT.601, the JPEG convention slideio uses)
            ycc = tile.astype(np.float32)
            yy, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
            tile = np.stack(
                [yy + 1.402 * cr, yy - 0.344136 * cb - 0.714136 * cr, yy + 1.772 * cb],
                axis=-1,
            )
            tile = np.clip(tile, 0, 255).astype(np.uint8)
        if len(self._tile_cache) >= self._tile_cache_cap:
            self._tile_cache.pop(next(iter(self._tile_cache)))
        self._tile_cache[key] = tile
        return tile

    def _read_region_j2k(self, x, y, w, h, out_w, out_h) -> np.ndarray:
        from PIL import Image

        W, H = self._size
        x = max(0, min(int(x), W - 1))
        y = max(0, min(int(y), H - 1))
        w = min(int(w), W - x)
        h = min(int(h), H - y)
        tw, th = self._tile_dims
        rect = np.empty((h, w, 3), np.uint8)
        ty0 = (y // th) * th
        tx0 = (x // tw) * tw
        for ty in range(ty0, y + h, th):
            for tx in range(tx0, x + w, tw):
                tile = self._decode_j2k_tile(tx, ty)
                y0, y1 = max(y, ty), min(y + h, ty + th)
                x0, x1 = max(x, tx), min(x + w, tx + tw)
                rect[y0 - y : y1 - y, x0 - x : x1 - x] = tile[
                    y0 - ty : y1 - ty, x0 - tx : x1 - tx
                ]
        if (out_w, out_h) == (w, h):
            return rect
        return np.asarray(
            Image.fromarray(rect).resize((out_w, out_h), Image.BILINEAR)
        )

    def close(self):
        if self._handle:
            self._lib.kdt_tiff_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
