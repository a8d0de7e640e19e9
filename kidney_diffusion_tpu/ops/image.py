"""Jittable image ops: HSV conversion, binary morphology, tissue masks.

The reference leans on scikit-image / OpenCV for these
(/root/reference/patient_dataset.py:132-136,
sample_ultra_res.py:321-332). They sit in the gigapixel sampling hot
path (mag-2 tissue filtering runs per generated region), so here they
are pure jax.numpy — fusable, batchable, and runnable on device — with
numpy-compatible semantics. Each also works under plain numpy inputs
via jnp's array coercion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rgb_to_hsv(rgb: Array) -> Array:
    """RGB [0,1] (..., 3) -> HSV [0,1] (..., 3), matching
    skimage.color.rgb2hsv semantics."""
    rgb = jnp.asarray(rgb, jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))

    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _morph(mask: Array, size: int, op: str) -> Array:
    """Binary erode/dilate with a size×size all-ones structuring element,
    matching cv2.erode/cv2.dilate. Implemented with reduce_window so XLA
    lowers it to a fused windowed reduction."""
    m = jnp.asarray(mask).astype(jnp.float32)
    expanded = m.ndim == 2
    if expanded:
        m = m[None, ..., None]
    elif m.ndim == 3:
        m = m[..., None]
    pad = size // 2
    init, fn = (1.0, jax.lax.min) if op == "erode" else (0.0, jax.lax.max)
    out = jax.lax.reduce_window(
        m,
        init,
        fn,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, size - 1 - pad), (pad, size - 1 - pad), (0, 0)),
    )
    out = out[..., 0]
    if expanded:
        out = out[0]
    return out > 0.5


def binary_erode(mask: Array, size: int = 5) -> Array:
    return _morph(mask, size, "erode")


def binary_dilate(mask: Array, size: int = 51) -> Array:
    return _morph(mask, size, "dilate")


def tissue_mask(
    rgb: Array,
    *,
    hue_min: float = 0.5,
    sat_min: float = 0.02,
    value_min: float | None = None,
) -> Array:
    """HSV-threshold tissue detection.

    Kidney WSI: hue > 0.5 & sat > 0.02 (loose,
    /root/reference/ultra_res_patient_dataset.py:92) or
    hue > 0.8 & sat > 0.05 (strict, patient_dataset.py:136).
    AIRS aerial: value > 0.1 (sample_ultra_res.py:323)."""
    hsv = rgb_to_hsv(rgb)
    if value_min is not None:
        return hsv[..., 2] > value_min
    return jnp.logical_and(hsv[..., 0] > hue_min, hsv[..., 1] > sat_min)


def foreground_mask_for_patches(
    rgb: Array,
    *,
    airs: bool = False,
    erode_size: int = 5,
    dilate_size: int = 51,
) -> Array:
    """The mag-2 patch filter: tissue mask -> erode (remove specks) ->
    dilate (grow), /root/reference/sample_ultra_res.py:317-332."""
    if airs:
        m = tissue_mask(rgb, value_min=0.1)
    else:
        m = tissue_mask(rgb, hue_min=0.5, sat_min=0.02)
    m = binary_erode(m, erode_size)
    return binary_dilate(m, dilate_size)
