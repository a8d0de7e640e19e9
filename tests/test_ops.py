import numpy as np
import jax.numpy as jnp

from kidney_diffusion_tpu.ops import (
    binary_dilate,
    binary_erode,
    foreground_mask_for_patches,
    rgb_to_hsv,
    tissue_mask,
)


def test_rgb_to_hsv_matches_colorsys():
    import colorsys

    rng = np.random.default_rng(0)
    rgb = rng.uniform(size=(50, 3)).astype(np.float32)
    got = np.asarray(rgb_to_hsv(rgb))
    for i in range(50):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(got[i], [h, s, v], atol=1e-5)


def test_rgb_to_hsv_gray_and_black():
    out = np.asarray(rgb_to_hsv(np.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]])))
    np.testing.assert_allclose(out[0], [0, 0, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 0], atol=1e-6)


def test_erode_removes_specks():
    mask = np.zeros((32, 32), bool)
    mask[10, 10] = True  # single-pixel speck
    mask[20:28, 20:28] = True  # solid block
    out = np.asarray(binary_erode(mask, 5))
    assert not out[10, 10]
    assert out[23, 23]  # interior of the block survives


def test_dilate_grows():
    mask = np.zeros((64, 64), bool)
    mask[32, 32] = True
    out = np.asarray(binary_dilate(mask, 11))
    assert out[32, 37] and out[37, 32]
    assert not out[32, 45]


def test_erode_dilate_match_cv2_semantics():
    """Cross-check against a brute-force sliding window (what cv2 does)."""
    rng = np.random.default_rng(1)
    mask = rng.uniform(size=(20, 20)) > 0.6

    def brute(mask, size, op):
        pad = size // 2
        padded = np.pad(
            mask, pad, constant_values=(op == "erode")
        )
        out = np.zeros_like(mask)
        for i in range(mask.shape[0]):
            for j in range(mask.shape[1]):
                w = padded[i : i + size, j : j + size]
                out[i, j] = w.all() if op == "erode" else w.any()
        return out

    np.testing.assert_array_equal(np.asarray(binary_erode(mask, 5)), brute(mask, 5, "erode"))
    np.testing.assert_array_equal(np.asarray(binary_dilate(mask, 5)), brute(mask, 5, "dilate"))


def test_tissue_mask_thresholds():
    # pink-ish tissue pixel: hue ~0.92, sat ~0.3
    tissue = np.array([[[0.9, 0.6, 0.7]]])
    background = np.array([[[0.95, 0.95, 0.95]]])
    assert bool(tissue_mask(tissue)[0, 0])
    assert not bool(tissue_mask(background)[0, 0])
    # AIRS value-threshold mode
    assert bool(tissue_mask(np.array([[[0.5, 0.5, 0.5]]]), value_min=0.1)[0, 0])
    assert not bool(tissue_mask(np.array([[[0.05, 0.05, 0.05]]]), value_min=0.1)[0, 0])


def test_foreground_mask_pipeline():
    img = np.full((64, 64, 3), 0.95, np.float32)
    img[20:40, 20:40] = [0.9, 0.6, 0.7]  # tissue block
    img[5, 5] = [0.9, 0.6, 0.7]  # speck, must be eroded away
    m = np.asarray(foreground_mask_for_patches(img, dilate_size=11))
    assert m[30, 30]
    # erode(5) shrinks the block to rows 22..37, dilate(11) grows to 17..42
    assert m[17, 30] and not m[16, 30]
    assert not m[5, 5]  # speck removed
