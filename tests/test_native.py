"""Native engine tests — skipped when native/libkdt_native.so isn't built."""

import numpy as np
import pytest

from kidney_diffusion_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built (make -C native)"
)


def _img(h=100, w=120, seed=0):
    return np.random.default_rng(seed).integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def test_extract_patch_identity():
    img = _img()
    # region == out_size at in-bounds offset: pixel-exact copy
    out = native.extract_patch(img, 10, 20, 32, 32)
    np.testing.assert_array_equal(out, img[20:52, 10:42])


def test_extract_patch_oob_fill():
    img = _img()
    out = native.extract_patch(img, -16, -16, 32, 32, fill=(9, 8, 7))
    np.testing.assert_array_equal(out[:16, :16], np.broadcast_to((9, 8, 7), (16, 16, 3)))
    np.testing.assert_array_equal(out[16:, 16:], img[:16, :16])


def test_extract_patch_matches_numpy_read_block():
    from kidney_diffusion_tpu.data.wsi import ArraySlide, read_block

    img = _img(200, 200)
    slide = ArraySlide(img)
    mags = (100, 50, 25)
    for x, y, mag in [(-30, 10, 1), (150, 150, 1), (0, 0, 2), (-500, -500, 0)]:
        ref = read_block(slide, mag, x, y, patch_size=40, mag_sizes=mags)
        got = native.extract_patch(
            img, x, y, mags[mag], 40
        ).astype(np.float32) / 255.0
        # same fill + coverage geometry; resampling kernels differ
        # (numpy path is nearest, native is bilinear), so compare the
        # fill mask exactly and content loosely
        fill = np.asarray((242, 243, 242), np.float32) / 255.0
        ref_fill = np.all(np.abs(ref - fill) < 1e-6, axis=-1)
        got_fill = np.all(np.abs(got - fill) < 1e-6, axis=-1)
        frac_equal = (ref_fill == got_fill).mean()
        assert frac_equal > 0.97, (x, y, mag, frac_equal)


def test_extract_patch_augmentation_parity():
    from kidney_diffusion_tpu.ops.augment import flip_rotate

    img = _img()
    base = native.extract_patch(img, 10, 10, 32, 32, aug_index=0)
    for k in range(8):
        got = native.extract_patch(img, 10, 10, 32, 32, aug_index=k)
        expected = flip_rotate(base, k)
        np.testing.assert_array_equal(got, expected, err_msg=f"k={k}")


def test_extract_batch_matches_single():
    img = _img(300, 300)
    xs = np.asarray([0, 50, -20, 250])
    ys = np.asarray([0, 80, 290, -10])
    regions = np.asarray([64, 64, 64, 64])
    aug = np.asarray([0, 3, 5, 7], np.int32)
    batch = native.extract_batch(img, xs, ys, regions, 32, aug=aug, threads=4)
    for i in range(4):
        single = native.extract_patch(
            img, xs[i], ys[i], regions[i], 32, aug_index=int(aug[i])
        )
        np.testing.assert_array_equal(batch[i], single)


def test_tissue_mask_matches_python():
    from kidney_diffusion_tpu.ops.image import tissue_mask

    img = _img(64, 64, seed=3)
    got = native.tissue_mask_u8(img, 0.5, 0.02)
    ref = np.asarray(tissue_mask(img.astype(np.float32) / 255.0))
    assert (got == ref).mean() > 0.995  # fp rounding at threshold edges


def test_native_tiff_slide(tmp_path):
    """Round-trip through a real tiled TIFF written by PIL."""
    from PIL import Image

    img = _img(512, 512, seed=4)
    path = str(tmp_path / "slide.tif")
    Image.fromarray(img).save(path, tile_size=(128, 128), compression=None)

    slide = native.NativeSlide(path)
    assert slide.size == (512, 512)
    region = slide.read_region(100, 200, 64, 64, 64, 64)
    np.testing.assert_array_equal(region, img[200:264, 100:164])
    # resampled read
    small = slide.read_region(0, 0, 512, 512, 64, 64)
    assert small.shape == (64, 64, 3)
    slide.close()
