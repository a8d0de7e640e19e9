"""AIRS Christchurch aerial-imagery ultra-res dataset.

Capability parity with /root/reference/ultra_res_airs.py: in-RAM aerial
tiles, black fill, MAG_LEVEL_SIZES (10000, 3328, 1024), 8
flips/rotations, optional 6-channel center conditioning.

Notes vs the reference:
  * ultra_res_airs.py:108-111 `return`s inside its patch-grid loop, so
    each source image contributes only the FIRST grid patch. That is a
    latent bug; here the grid is enumerated properly (stride =
    patch_size // 2 as the loop intends). Set `first_patch_only=True`
    for the reference's literal behaviour.
  * images are held as uint8 (4x smaller than the reference's fp16
    tensors) and converted on read.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops.augment import NUM_FLIPS_ROTATIONS, flip_rotate
from .ultra_res import center_cond_image
from .wsi import (
    AIRS_FILL_COLOR,
    AIRS_MAG_LEVEL_SIZES,
    ArraySlide,
    inner_patch_width,
    read_block,
    read_block_and_zoomed,
)


def load_image(path: str) -> np.ndarray:
    """Load an aerial tile as HWC uint8."""
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


class AirsDataset:
    def __init__(
        self,
        image_dir: str,
        ignore_list: Sequence[str] = (),
        magnification_level: int = 0,
        *,
        center_cond: bool = False,
        first_patch_only: bool = False,
        images: Optional[List[np.ndarray]] = None,  # injectable for tests
        verbose: bool = False,
    ):
        self.patch_size = AIRS_MAG_LEVEL_SIZES[2]
        self.mag_sizes = AIRS_MAG_LEVEL_SIZES
        self.center_cond = center_cond
        self.magnification_level = magnification_level

        if images is None:
            paths = sorted(glob.glob(os.path.join(image_dir, "*")))
            paths = [p for p in paths if os.path.basename(p) not in ignore_list]
            images = [load_image(p) for p in paths]
        self.slides = [ArraySlide(img) for img in images]
        if verbose:
            print(f"{len(self.slides)} images in dataset")

        # (slide_idx, x, y) items
        self.items: List[Tuple[int, int, int]] = []
        if magnification_level == 0:
            # one centered mag-0 square per image
            for i in range(len(self.slides)):
                self.items.append((i, 0, 0))
        else:
            stride = self.patch_size // 2
            span = self.mag_sizes[0] - self.patch_size
            for i in range(len(self.slides)):
                for y in range(0, span, stride):
                    for x in range(0, span, stride):
                        self.items.append((i, x, y))
                        if first_patch_only:
                            break
                    if first_patch_only:
                        break

    def __len__(self):
        return NUM_FLIPS_ROTATIONS * len(self.items)

    def __getitem__(self, index: int):
        slide_idx, x, y = self.items[index // NUM_FLIPS_ROTATIONS]
        slide = self.slides[slide_idx]
        mag = self.magnification_level

        if mag == 0:
            size0 = self.mag_sizes[0]
            patch = read_block(
                slide, 0,
                slide.size[0] // 2 - size0 // 2,
                slide.size[1] // 2 - size0 // 2,
                patch_size=self.patch_size,
                mag_sizes=self.mag_sizes,
                fill_color=AIRS_FILL_COLOR,
            )
            return np.ascontiguousarray(flip_rotate(patch, index))

        patch, zoomed = read_block_and_zoomed(
            slide, mag, x, y,
            patch_size=self.patch_size,
            mag_sizes=self.mag_sizes,
            fill_color=AIRS_FILL_COLOR,
        )
        patch = np.ascontiguousarray(flip_rotate(patch, index))
        zoomed = np.ascontiguousarray(flip_rotate(zoomed, index))
        if self.center_cond:
            pw = inner_patch_width(mag, patch_size=self.patch_size, mag_sizes=self.mag_sizes)
            return patch, center_cond_image(zoomed, pw)
        return patch, zoomed
