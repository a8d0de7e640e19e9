"""Scale-matched paired patch sampling for FID at matched magnification.

Capability parity with /root/reference/patch.py: sample random crops at
a random scale from a real slide and a fake gigapixel image, reusing the
SAME scale transformation across the pair (patch.py:95-96) so both sets
see identical magnification statistics. Works over the `Slide` protocol
(SVS via slideio, generated JPG via ArraySlide).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

from ..data.wsi import Slide


@dataclasses.dataclass
class CropTransformation:
    """The scale part of a paired crop (reused across real/fake)."""

    rand_size: int
    crop_x: int
    crop_y: int


def sample_patch(
    slide: Slide,
    min_dim: int,
    min_scale: Optional[float],
    max_scale: float,
    patch_size: int,
    rng: np.random.Generator,
    transformation: Optional[CropTransformation] = None,
) -> Tuple[np.ndarray, CropTransformation]:
    """One random crop at random scale; pass `transformation` to reuse the
    scale of a previous sample (patch.py:13-78 semantics)."""
    width, height = slide.size

    x = rng.integers(max(width - min_dim, 1)) if width > min_dim else 0
    y = rng.integers(max(height - min_dim, 1)) if height > min_dim else 0

    if transformation is None:
        lo_scale = patch_size / min_dim if min_scale is None else max(
            min_scale, patch_size / min_dim
        )
        max_size = patch_size / lo_scale
        min_size = patch_size / max_scale
        random_size = rng.uniform(min_size, max_size)
        scale = patch_size / random_size
        rand_size = int(np.round(patch_size / scale))
        size_diff = rand_size - patch_size
        crop_x = int(rng.integers(size_diff)) if size_diff > 0 else 0
        crop_y = int(rng.integers(size_diff)) if size_diff > 0 else 0
        transformation = CropTransformation(rand_size, crop_x, crop_y)

    scale = transformation.rand_size / min_dim
    top_left_x = int(x + transformation.crop_x / scale)
    top_left_y = int(y + transformation.crop_y / scale)
    rect = int(patch_size / scale)
    patch = slide.read_region(top_left_x, top_left_y, rect, rect, patch_size, patch_size)
    return patch, transformation


def sample_pair(
    real: Slide,
    fake: Slide,
    *,
    patch_size: int,
    size_min: int,
    size_max: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """A (real, fake) pair with the same scale transformation."""
    scale_min = patch_size / size_max if size_max > 0 else None
    scale_max = patch_size / size_min
    min_dim = min(*real.size, *fake.size)
    real_patch, t = sample_patch(real, min_dim, scale_min, scale_max, patch_size, rng)
    fake_patch, _ = sample_patch(
        fake, min_dim, scale_min, scale_max, patch_size, rng, transformation=t
    )
    return real_patch, fake_patch


def export_pairs(
    real_slides,
    fake_slides,
    *,
    num_files: int,
    patch_size: int,
    size_min: int,
    size_max: int,
    real_output: str,
    fake_output: str,
    seed: int = 0,
    num_workers: int = 16,
) -> None:
    """Dump num_files paired PNGs, sharded into subdirs of 1000
    (patch.py:100-108)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..utils.logging import save_image

    def job(i: int):
        rng = np.random.default_rng((seed, i))
        real = real_slides[rng.integers(len(real_slides))]
        fake = fake_slides[rng.integers(len(fake_slides))]
        rp, fp = sample_pair(
            real, fake, patch_size=patch_size, size_min=size_min,
            size_max=size_max, rng=rng,
        )
        for root, patch in ((real_output, rp), (fake_output, fp)):
            d = os.path.join(root, str(i // 1000))
            os.makedirs(d, exist_ok=True)
            save_image(patch.astype(np.float32) / 255.0, os.path.join(d, f"{i}.png"))

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        list(pool.map(job, range(num_files)))
