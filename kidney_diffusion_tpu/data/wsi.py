"""Whole-slide image access: slide backends + multi-magnification
region geometry.

The reference reads SVS slides through the C++ `slideio` library
(/root/reference/ultra_res_patient_dataset.py:154-200). Here the
geometry is factored out once over a small `Slide` protocol so the same
code serves every backend:

  * `ArraySlide`    — an in-RAM numpy image (tests, AIRS tiles)
  * `SlideioSlide`  — slideio SVS decode (gated import)
  * `NativeSlide`   — the in-repo C++ tiled-TIFF reader
    (kidney_diffusion_tpu/data/native.py), when built

`read_block(slide, mag_level, x, y)` reproduces the reference's
out-of-bounds-safe semantics: read a MAG_LEVEL_SIZES[mag]² region whose
top-left corner is (x, y) in level-0 slide coordinates, resize it to
patch_size², and fill anything outside the slide with FILL_COLOR.
"""

from __future__ import annotations

from typing import Protocol, Tuple

import numpy as np

# source pixels per 1024² model patch per magnification level
# (/root/reference/ultra_res_patient_dataset.py:18, ultra_res_airs.py:23)
MAG_LEVEL_SIZES = (40000, 6500, 1024)
AIRS_MAG_LEVEL_SIZES = (10000, 3328, 1024)
FILL_COLOR = (242, 243, 242)  # /root/reference/ultra_res_patient_dataset.py:19
AIRS_FILL_COLOR = (0, 0, 0)
PATCH_SIZE = 1024


class Slide(Protocol):
    """Minimal slide interface: level-0 size + resampled region reads."""

    @property
    def size(self) -> Tuple[int, int]:
        """(width, height) at level 0."""
        ...

    def read_region(
        self, x: int, y: int, w: int, h: int, out_w: int, out_h: int
    ) -> np.ndarray:
        """Read the in-bounds rect (x, y, w, h), resampled to
        (out_h, out_w, 3) uint8."""
        ...


class ArraySlide:
    """A slide backed by an in-RAM uint8 HWC array."""

    def __init__(self, image: np.ndarray):
        assert image.ndim == 3 and image.shape[2] == 3, image.shape
        self.image = np.ascontiguousarray(image, dtype=np.uint8)

    @property
    def size(self) -> Tuple[int, int]:
        h, w, _ = self.image.shape
        return (w, h)

    def read_region(self, x, y, w, h, out_w, out_h) -> np.ndarray:
        region = self.image[y : y + h, x : x + w]
        return resize_nearest(region, out_w, out_h)


class SlideioSlide:
    """SVS slide via the slideio C++ library (optional dependency)."""

    def __init__(self, path: str):
        import slideio  # gated: not present in all environments

        self._scene = slideio.open_slide(path, "SVS").get_scene(0)

    @property
    def size(self) -> Tuple[int, int]:
        return tuple(self._scene.size)

    def read_region(self, x, y, w, h, out_w, out_h) -> np.ndarray:
        return self._scene.read_block((x, y, w, h), size=(out_w, out_h))


class PILSlide:
    """Last-resort backend: decode the whole level-0 image once with PIL
    and serve regions from RAM. Only viable for small slides/fixtures —
    the native reader is the production path for gigapixel SVS."""

    def __init__(self, path: str):
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None
        with Image.open(path) as im:
            self._slide = ArraySlide(np.asarray(im.convert("RGB")))

    @property
    def size(self) -> Tuple[int, int]:
        return self._slide.size

    def read_region(self, x, y, w, h, out_w, out_h) -> np.ndarray:
        return self._slide.read_region(x, y, w, h, out_w, out_h)


def open_slide(path: str) -> "Slide":
    """Open an SVS/TIFF slide with the best available backend:
    the C++ tiled-TIFF reader (native/kdt_native.cpp) when built,
    slideio when installed, whole-image PIL decode as a last resort.
    Replaces the reference's unconditional slideio dependency
    (/root/reference/patient_dataset.py:118)."""
    from . import native

    if native.available():
        try:
            return native.NativeSlide(path)
        except native.UnsupportedSlideError as unsupported:
            # codec the native engine can't decode here (e.g. J2K SVS
            # without a PIL J2K codec). slideio bundles openjpeg and CAN
            # decode Aperio J2K — try it; but a PIL whole-image fallback
            # would fail too, just later and more confusingly, so
            # without slideio fail loudly with the real reason.
            try:
                return SlideioSlide(path)
            except Exception:
                raise unsupported from None
        except Exception as e:  # not a TIFF container, or engine failure
            print(f"[wsi] native reader failed on {path} ({e!r}); "
                  "trying slideio/PIL", flush=True)
    try:
        return SlideioSlide(path)
    except Exception as e:
        # slideio missing OR it rejected the file (non-SVS image) —
        # whole-image PIL decode is the last resort (RAM-bound: fine for
        # fixtures/small images, loud warning for real slides)
        if not isinstance(e, ImportError):
            print(f"[wsi] slideio failed on {path} ({e!r}); "
                  "falling back to whole-image PIL decode", flush=True)
        return PILSlide(path)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize without external deps (host-side only;
    heavy resampling belongs on-device or in the native reader)."""
    h, w = img.shape[:2]
    if h == out_h and w == out_w:
        return img
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h, 0, h - 1).astype(np.int64)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w, 0, w - 1).astype(np.int64)
    return img[ys][:, xs]


def read_region_filled(
    slide: Slide,
    x: int,
    y: int,
    w: int,
    h: int,
    out_w: int,
    out_h: int,
    *,
    fill_color: Tuple[int, int, int] = FILL_COLOR,
) -> np.ndarray:
    """OOB-safe read of the rect (x, y, w, h) resampled to (out_h, out_w):
    the in-bounds part is read and placed at its true geometric offset,
    everything outside the slide is fill_color — matching the reference's
    slideio.read_block edge semantics (slideio pads, it never stretches;
    /root/reference/patient_dataset.py:219). Use this instead of raw
    `slide.read_region` whenever (x, y) can fall near a slide edge."""
    width, height = slide.size
    scale_x = out_w / w
    scale_y = out_h / h

    rx = max(x, 0)
    ry = max(y, 0)
    rw = min(width - rx, w - max(-x, 0))
    rh = min(height - ry, h - max(-y, 0))

    if rx == x and ry == y and rw == w and rh == h:
        return slide.read_region(x, y, w, h, out_w, out_h)

    out = np.empty((out_h, out_w, 3), np.uint8)
    out[:] = np.asarray(fill_color, np.uint8)
    if rw > 0 and rh > 0:
        sub_w = int(rw * scale_x)
        sub_h = int(rh * scale_y)
        if sub_w > 0 and sub_h > 0:
            region = slide.read_region(rx, ry, rw, rh, sub_w, sub_h)
            ox = int((rx - x) * scale_x)
            oy = int((ry - y) * scale_y)
            out[oy : oy + sub_h, ox : ox + sub_w] = region[..., :3]
    return out


def read_block(
    slide: Slide,
    mag_level: int,
    x: int,
    y: int,
    *,
    patch_size: int = PATCH_SIZE,
    mag_sizes: Tuple[int, ...] = MAG_LEVEL_SIZES,
    fill_color: Tuple[int, int, int] = FILL_COLOR,
) -> np.ndarray:
    """OOB-safe multi-mag region read -> float32 HWC in [0, 1].

    Semantics match /root/reference/ultra_res_patient_dataset.py:154-200:
    the requested region is mag_sizes[mag_level]² source pixels at (x, y);
    parts outside the slide are fill_color; the result is patch_size².

    In-RAM slides take the C++ fast path (multithreaded bilinear
    extraction, data/native.py) when native/libkdt_native.so is built.
    """
    if isinstance(slide, ArraySlide):
        from . import native

        if native.available():
            image_size = mag_sizes[mag_level]
            patch = native.extract_patch(
                slide.image, int(x), int(y), int(image_size), int(patch_size),
                fill=fill_color,
            )
            return patch.astype(np.float32) / 255.0

    image_size = mag_sizes[mag_level]
    out = read_region_filled(
        slide, x, y, image_size, image_size, patch_size, patch_size,
        fill_color=fill_color,
    )
    return out.astype(np.float32) / 255.0


def read_block_and_zoomed(
    slide: Slide,
    mag_level: int,
    x: int,
    y: int,
    *,
    patch_size: int = PATCH_SIZE,
    mag_sizes: Tuple[int, ...] = MAG_LEVEL_SIZES,
    fill_color: Tuple[int, int, int] = FILL_COLOR,
) -> Tuple[np.ndarray, np.ndarray]:
    """A patch plus its concentric zoomed-out context at mag_level-1
    (/root/reference/ultra_res_patient_dataset.py:203-227)."""
    image_size = mag_sizes[mag_level]
    zoomed_size = mag_sizes[mag_level - 1]
    cx = x + image_size // 2
    cy = y + image_size // 2
    zx = cx - zoomed_size // 2
    zy = cy - zoomed_size // 2
    patch = read_block(
        slide, mag_level, x, y,
        patch_size=patch_size, mag_sizes=mag_sizes, fill_color=fill_color,
    )
    zoomed = read_block(
        slide, mag_level - 1, zx, zy,
        patch_size=patch_size, mag_sizes=mag_sizes, fill_color=fill_color,
    )
    return patch, zoomed


def inner_patch_width(
    mag_level: int,
    *,
    patch_size: int = PATCH_SIZE,
    mag_sizes: Tuple[int, ...] = MAG_LEVEL_SIZES,
) -> int:
    """Width (px) of a mag-k patch inside a generated mag-(k-1) image
    (/root/reference/sample_ultra_res.py:273-280)."""
    return int(mag_sizes[mag_level] * patch_size / mag_sizes[mag_level - 1])
