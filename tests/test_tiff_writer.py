"""Tiled-TIFF writer + native tiled/JPEG decode paths.

Round-1 fixtures written with PIL were silently striped (PIL ignores
`tile_size`), so the native reader's TILE path — the layout real Aperio
SVS uses (/root/reference/patient_dataset.py:118 via slideio) — was
never exercised. These tests decode genuinely tiled files, uncompressed
and JPEG-compressed, through libtiff via the C++ engine.
"""

import numpy as np
import pytest
from PIL import Image

from kidney_diffusion_tpu.data import native
from kidney_diffusion_tpu.data.tiff_writer import (
    COMPRESSION_JPEG,
    COMPRESSION_NONE,
    write_synthetic_svs,
    write_tiled_tiff,
)

needs_native = pytest.mark.skipif(
    not native.available(), reason="libkdt_native.so not built"
)


def _smooth_img(h, w, seed=1, block=48):
    """Blocky-smooth RGB8 (keeps JPEG round-trip error ~1)."""
    rng = np.random.RandomState(seed)
    img = np.kron(
        rng.rand(h // block + 1, w // block + 1, 3), np.ones((block, block, 1))
    )
    return (img[:h, :w] * 255).astype(np.uint8)


def test_written_file_is_actually_tiled(tmp_path):
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [_smooth_img(256, 384)], tile_size=(128, 128),
                     compression=COMPRESSION_NONE)
    with Image.open(path) as im:
        assert 322 in im.tag_v2 and im.tag_v2[322] == 128  # TileWidth
        assert 323 in im.tag_v2 and im.tag_v2[323] == 128  # TileLength
        assert 273 not in im.tag_v2  # no StripOffsets


def test_uncompressed_tiles_roundtrip_exact(tmp_path):
    img = (np.random.RandomState(3).rand(256, 384, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [img], tile_size=(128, 128), compression=COMPRESSION_NONE)
    with Image.open(path) as im:
        np.testing.assert_array_equal(np.asarray(im.convert("RGB")), img)


def test_edge_tiles_padded(tmp_path):
    """Dims not multiples of the tile size: content is exact, padding
    is invisible to readers."""
    img = (np.random.RandomState(5).rand(200, 300, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [img], tile_size=(128, 128), compression=COMPRESSION_NONE)
    with Image.open(path) as im:
        assert im.size == (300, 200)
        np.testing.assert_array_equal(np.asarray(im.convert("RGB")), img)


def test_jpeg_tiles_decode_with_pil(tmp_path):
    img = _smooth_img(256, 384)
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [img], tile_size=(128, 128), quality=95)
    with Image.open(path) as im:
        assert im.tag_v2[259] == 7  # Compression: new-style JPEG
        arr = np.asarray(im.convert("RGB"))
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 4


@needs_native
def test_native_reads_uncompressed_tiles_exact(tmp_path):
    img = (np.random.RandomState(7).rand(512, 640, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [img], tile_size=(128, 128), compression=COMPRESSION_NONE)
    slide = native.NativeSlide(path)
    assert slide.size == (640, 512)
    # region crossing tile boundaries, 1:1
    r = slide.read_region(100, 100, 200, 150, 200, 150)
    np.testing.assert_array_equal(r, img[100:250, 100:300])
    slide.close()


@needs_native
def test_native_reads_jpeg_tiles(tmp_path):
    """THE SVS decode path: JPEG tiles through TIFFReadRGBATile."""
    img = _smooth_img(512, 640, seed=9)
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [img], tile_size=(128, 128), quality=95)
    slide = native.NativeSlide(path)
    # tile-boundary-crossing region
    r = slide.read_region(100, 200, 300, 160, 300, 160)
    assert np.abs(r.astype(int) - img[200:360, 100:400].astype(int)).max() <= 4
    # resampled read (2x downscale)
    small = slide.read_region(0, 0, 512, 512, 256, 256)
    assert small.shape == (256, 256, 3)
    slide.close()


@needs_native
def test_native_reads_synthetic_svs_level0(tmp_path):
    img = _smooth_img(512, 512, seed=11)
    path = str(tmp_path / "fake.svs")
    write_synthetic_svs(path, img, levels=3, tile_size=(128, 128), quality=95)
    # pyramid structure is real
    with Image.open(path) as im:
        assert im.n_frames == 3
        assert "Aperio" in im.tag_v2[270]
        im.seek(1)
        assert im.size == (256, 256)
    # native reader serves level 0
    slide = native.NativeSlide(path)
    assert slide.size == (512, 512)
    r = slide.read_region(64, 64, 128, 128, 128, 128)
    assert np.abs(r.astype(int) - img[64:192, 64:192].astype(int)).max() <= 4
    slide.close()


@needs_native
def test_native_corrupt_jpeg_tile_raises(tmp_path):
    """A bad tile must surface as a clear error, not garbage pixels."""
    img = _smooth_img(256, 256, seed=13)
    path = str(tmp_path / "t.tif")
    write_tiled_tiff(path, [img], tile_size=(128, 128), quality=95)
    # stomp the first tile's JPEG stream (tile data starts right after
    # the 8-byte header)
    with open(path, "r+b") as f:
        f.seek(16)
        f.write(b"\xde\xad\xbe\xef" * 8)
    slide = native.NativeSlide(path)
    with pytest.raises(IOError):
        slide.read_region(0, 0, 128, 128, 128, 128)
    slide.close()


def test_open_slide_dispatch(tmp_path):
    from kidney_diffusion_tpu.data import wsi

    img = _smooth_img(256, 256, seed=15)
    path = str(tmp_path / "fake.svs")
    write_synthetic_svs(path, img, levels=2, tile_size=(128, 128))
    slide = wsi.open_slide(path)
    assert slide.size == (256, 256)
    r = slide.read_region(0, 0, 64, 64, 64, 64)
    assert np.abs(r.astype(int) - img[:64, :64].astype(int)).max() <= 4
    if hasattr(slide, "close"):
        slide.close()


# ---------------------------------------------------------------------------
# Aperio JPEG2000 (compression 33003/33005)
# ---------------------------------------------------------------------------

needs_j2k = pytest.mark.skipif(
    not native.pil_j2k_available(), reason="Pillow lacks jpg_2000"
)


@needs_native
@needs_j2k
def test_native_reads_j2k_rgb_tiles(tmp_path):
    """Aperio 33005 (RGB J2K codestream tiles): raw tiles fetched in C++,
    decoded via Pillow/openjpeg — matches slideio's role at
    /root/reference/patient_dataset.py:118."""
    from kidney_diffusion_tpu.data.tiff_writer import COMPRESSION_J2K_RGB

    img = _smooth_img(256, 384, seed=21)
    path = str(tmp_path / "j2k.svs")
    write_tiled_tiff(path, [img], tile_size=(128, 128),
                     compression=COMPRESSION_J2K_RGB)
    slide = native.NativeSlide(path)
    assert slide._compression == 33005
    region = slide.read_region(100, 60, 200, 150, 200, 150)
    assert np.abs(region.astype(int) - img[60:210, 100:300].astype(int)).max() <= 4
    # resampled read crosses tile boundaries
    small = slide.read_region(0, 0, 384, 256, 96, 64)
    assert small.shape == (64, 96, 3)
    slide.close()


@needs_native
@needs_j2k
def test_native_reads_j2k_ycbcr_tiles(tmp_path):
    """Aperio 33003 (YCbCr planes, colour transform outside the
    codestream): the reader must apply BT.601 YCbCr->RGB itself."""
    from kidney_diffusion_tpu.data.tiff_writer import COMPRESSION_J2K_YCBCR

    img = _smooth_img(256, 256, seed=22)
    path = str(tmp_path / "j2k_ycc.svs")
    write_tiled_tiff(path, [img], tile_size=(128, 128),
                     compression=COMPRESSION_J2K_YCBCR)
    slide = native.NativeSlide(path)
    region = slide.read_region(0, 0, 256, 256, 256, 256)
    # lossy: J2K default rate + YCbCr round-trip; smooth image stays close
    assert np.abs(region.astype(int) - img.astype(int)).mean() < 3
    slide.close()


@needs_native
def test_j2k_without_decoder_raises_clear_error(tmp_path, monkeypatch):
    """With no J2K decoder available, opening a J2K SVS must raise
    UnsupportedSlideError loudly — including through open_slide (no
    silent PIL fallback that would also fail)."""
    from kidney_diffusion_tpu.data import wsi
    from kidney_diffusion_tpu.data.tiff_writer import COMPRESSION_J2K_RGB

    img = _smooth_img(128, 128, seed=23)
    path = str(tmp_path / "j2k.svs")
    write_tiled_tiff(path, [img], tile_size=(128, 128),
                     compression=COMPRESSION_J2K_RGB)
    monkeypatch.setattr(native, "pil_j2k_available", lambda: False)
    with pytest.raises(native.UnsupportedSlideError, match="JPEG2000"):
        native.NativeSlide(path)
    with pytest.raises(native.UnsupportedSlideError, match="JPEG2000"):
        wsi.open_slide(path)
