"""Minimal tiled-TIFF / synthetic-SVS writer (pure Python).

Aperio SVS — the reference's slide format, read through slideio
(/root/reference/patient_dataset.py:118) — is a multi-page tiled TIFF
whose level-0 page holds JPEG-compressed tiles. PIL cannot write tiled
TIFFs (its `tile_size` argument is silently ignored; files come out
striped), so synthetic slides for tests/demos need a real writer. This
one emits classic little-endian TIFF with:

  * tiled pages (TileWidth/TileLength/TileOffsets/TileByteCounts)
  * per-tile compression: none (1) or JPEG (7; each tile a complete
    JFIF stream, the layout libtiff's tile-JPEG codec reads)
  * multiple pages — an SVS-style resolution pyramid
  * optional ImageDescription (Aperio-style header strings)

Only what the data path needs — RGB8, chunky planar config — nothing
more. The native reader (native/kdt_native.cpp:kdt_tiff_read_region)
consumes these files through libtiff's TIFFReadRGBATile.
"""

from __future__ import annotations

import io
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_IMAGE_DESCRIPTION = 270
_SAMPLES_PER_PIXEL = 277
_PLANAR_CONFIG = 284
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_YCBCR_SUBSAMPLING = 530

_TYPE_SHORT = 3   # u16
_TYPE_LONG = 4    # u32
_TYPE_ASCII = 2

COMPRESSION_NONE = 1
COMPRESSION_JPEG = 7  # "new-style" JPEG: each tile a full JFIF stream
COMPRESSION_J2K_YCBCR = 33003  # Aperio JPEG2000, YCbCr components
COMPRESSION_J2K_RGB = 33005    # Aperio JPEG2000, RGB components


def _encode_tile(tile: np.ndarray, compression: int, quality: int) -> bytes:
    if compression == COMPRESSION_NONE:
        return tile.tobytes()
    if compression == COMPRESSION_JPEG:
        from PIL import Image

        buf = io.BytesIO()
        # 4:4:4 — with photometric RGB, libtiff rejects subsampled tiles
        # ("Improper JPEG sampling factors")
        Image.fromarray(tile).save(buf, "JPEG", quality=quality, subsampling=0)
        return buf.getvalue()
    if compression in (COMPRESSION_J2K_RGB, COMPRESSION_J2K_YCBCR):
        from PIL import Image

        if compression == COMPRESSION_J2K_YCBCR:
            # Aperio 33003: the RGB->YCbCr transform happens OUTSIDE the
            # codestream; encode full-range BT.601 YCbCr planes
            rgb = tile.astype(np.float32)
            r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
            tile = np.clip(np.stack([
                0.299 * r + 0.587 * g + 0.114 * b,
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
            ], axis=-1), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        # raw J2K codestream (no JP2 container), the Aperio tile layout
        Image.fromarray(tile).save(buf, "JPEG2000", no_jp2=True)
        return buf.getvalue()
    raise ValueError(f"unsupported compression {compression}")


def _tile_grid(img: np.ndarray, tile: Tuple[int, int]):
    """Yield edge-padded (th, tw, 3) tiles in row-major tile order (the
    TIFF tile layout; edge padding keeps JPEG blocks clean at borders)."""
    h, w = img.shape[:2]
    th, tw = tile
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            t = img[ty : ty + th, tx : tx + tw]
            if t.shape[0] != th or t.shape[1] != tw:
                t = np.pad(
                    t, ((0, th - t.shape[0]), (0, tw - t.shape[1]), (0, 0)),
                    mode="edge",
                )
            yield np.ascontiguousarray(t)


class _IfdBuilder:
    """One page's IFD: fixed 12-byte entries + an out-of-line value area."""

    def __init__(self):
        self.entries = []  # (tag, type, count, packed-inline-or-None, extra)

    def put(self, tag: int, typ: int, values) -> None:
        if typ == _TYPE_ASCII:
            data = values.encode() + b"\0"
            count = len(data)
        else:
            fmt = "<H" if typ == _TYPE_SHORT else "<I"
            data = b"".join(struct.pack(fmt, v) for v in values)
            count = len(values)
        if len(data) <= 4:
            self.entries.append((tag, typ, count, data.ljust(4, b"\0"), None))
        else:
            self.entries.append((tag, typ, count, None, data))

    def render(self, ifd_offset: int, next_ifd: int) -> bytes:
        """Serialize at `ifd_offset`; out-of-line data follows the IFD.
        Every out-of-line value starts word-aligned (TIFF spec)."""
        n = len(self.entries)
        extra_base = ifd_offset + 2 + n * 12 + 4
        head = struct.pack("<H", n)
        extras = b""
        for tag, typ, count, inline, extra in sorted(self.entries):
            if inline is not None:
                val = inline
            else:
                if (extra_base + len(extras)) % 2:
                    extras += b"\0"
                val = struct.pack("<I", extra_base + len(extras))
                extras += extra
            head += struct.pack("<HHI", tag, typ, count) + val
        return head + struct.pack("<I", next_ifd) + extras


def write_tiled_tiff(
    path: str,
    pages: Sequence[np.ndarray],
    *,
    tile_size: Tuple[int, int] = (256, 256),
    compression: int = COMPRESSION_JPEG,
    quality: int = 95,
    descriptions: Optional[Sequence[str]] = None,
) -> None:
    """Write RGB8 `pages` (level 0 first) as a multi-page tiled TIFF."""
    assert pages, "need at least one page"
    th, tw = tile_size
    assert th % 16 == 0 and tw % 16 == 0, "TIFF tiles must be multiples of 16"

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, 0))  # IFD offset patched later

        ifds = []
        for page_idx, img in enumerate(pages):
            img = np.asarray(img)
            assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3, (
                "RGB8 HWC only"
            )
            offsets, counts = [], []
            for tile in _tile_grid(img, (th, tw)):
                data = _encode_tile(tile, compression, quality)
                offsets.append(f.tell())
                counts.append(len(data))
                f.write(data)
                if f.tell() % 2:  # word-align next tile
                    f.write(b"\0")

            ifd = _IfdBuilder()
            ifd.put(_IMAGE_WIDTH, _TYPE_LONG, [img.shape[1]])
            ifd.put(_IMAGE_LENGTH, _TYPE_LONG, [img.shape[0]])
            ifd.put(_BITS_PER_SAMPLE, _TYPE_SHORT, [8, 8, 8])
            ifd.put(_COMPRESSION, _TYPE_SHORT, [compression])
            if compression == COMPRESSION_JPEG:
                # JFIF tiles are YCbCr 4:4:4; declaring that lets
                # libtiff hand the colour conversion to libjpeg
                # (photometric RGB would make it read raw YCbCr planes)
                ifd.put(_PHOTOMETRIC, _TYPE_SHORT, [6])
                ifd.put(_YCBCR_SUBSAMPLING, _TYPE_SHORT, [1, 1])
            elif compression == COMPRESSION_J2K_YCBCR:
                ifd.put(_PHOTOMETRIC, _TYPE_SHORT, [6])  # Aperio layout
            else:
                ifd.put(_PHOTOMETRIC, _TYPE_SHORT, [2])  # RGB
            if descriptions and page_idx < len(descriptions):
                ifd.put(_IMAGE_DESCRIPTION, _TYPE_ASCII, descriptions[page_idx])
            ifd.put(_SAMPLES_PER_PIXEL, _TYPE_SHORT, [3])
            ifd.put(_PLANAR_CONFIG, _TYPE_SHORT, [1])
            ifd.put(_TILE_WIDTH, _TYPE_LONG, [tw])
            ifd.put(_TILE_LENGTH, _TYPE_LONG, [th])
            ifd.put(_TILE_OFFSETS, _TYPE_LONG, offsets)
            ifd.put(_TILE_BYTE_COUNTS, _TYPE_LONG, counts)
            ifds.append(ifd)

        # IFD chain at the tail
        ifd_offsets = []
        pos = f.tell() + (f.tell() % 2)
        for ifd in ifds:
            # two-pass: render once to size it, then with real next-pointer
            size = len(ifd.render(pos, 0))
            ifd_offsets.append(pos)
            pos += size + (size % 2)
        f.write(b"\0" * (f.tell() % 2))
        for i, ifd in enumerate(ifds):
            next_ptr = ifd_offsets[i + 1] if i + 1 < len(ifds) else 0
            data = ifd.render(ifd_offsets[i], next_ptr)
            f.write(data)
            if len(data) % 2:
                f.write(b"\0")

        f.seek(4)
        f.write(struct.pack("<I", ifd_offsets[0]))


def write_synthetic_svs(
    path: str,
    level0: np.ndarray,
    *,
    levels: int = 3,
    tile_size: Tuple[int, int] = (256, 256),
    quality: int = 90,
) -> None:
    """An SVS-shaped fixture: JPEG-tiled pyramid with Aperio-style
    description strings, downsampling 2x per level (box filter)."""
    pages = [np.asarray(level0)]
    for _ in range(1, levels):
        prev = pages[-1]
        h, w = (prev.shape[0] // 2) * 2, (prev.shape[1] // 2) * 2
        ds = prev[:h, :w].reshape(h // 2, 2, w // 2, 2, 3).mean((1, 3))
        pages.append(ds.astype(np.uint8))
    descs = [
        f"Aperio Fake SVS|AppMag = 40|Level {i} ({p.shape[1]}x{p.shape[0]})"
        for i, p in enumerate(pages)
    ]
    write_tiled_tiff(
        path, pages, tile_size=tile_size,
        compression=COMPRESSION_JPEG, quality=quality, descriptions=descs,
    )
