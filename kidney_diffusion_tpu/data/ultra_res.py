"""Ultra-res (multi-magnification) patient dataset.

Capability parity with /root/reference/ultra_res_patient_dataset.py:
per-(mag level) datasets over the 40000/6500/1024 pyramid —

  * mag 0: one slide-centered 40000² square per slide, 8 flips/rotations
  * mag 1/2: tissue-positive patches with the 8x4 index-encoded
    augmentation; each item is (patch, zoomed-out context at mag-1)
  * `center_cond=True`: zoomed context + nearest-upsampled center crop
    stacked to a 6-channel conditioning image (the "v2" variant,
    ultra_res_patient_dataset.py:257-261)

Slide access is injected via the `Slide` protocol; geometry lives in
data/wsi.py as pure functions.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..ops.augment import (
    NUM_FLIPS_ROTATIONS,
    NUM_TRANSLATIONS,
    flip_rotate,
    translation_offset,
)
from .patient import PatientMetadata, detect_tissue_patches
from .wsi import (
    FILL_COLOR,
    MAG_LEVEL_SIZES,
    PATCH_SIZE,
    Slide,
    inner_patch_width,
    read_block,
    read_block_and_zoomed,
    resize_nearest,
)


def center_cond_image(zoomed: np.ndarray, patch_width: int) -> np.ndarray:
    """6-channel conditioning: zoomed context + nearest-upsampled center
    crop (ultra_res_patient_dataset.py:257-261)."""
    size = zoomed.shape[0]
    y0 = (size - patch_width) // 2
    x0 = (size - patch_width) // 2
    center = zoomed[y0 : y0 + patch_width, x0 : x0 + patch_width]
    center_up = resize_nearest(
        (center * 255).astype(np.uint8), size, size
    ).astype(np.float32) / 255.0
    return np.concatenate([zoomed, center_up], axis=-1)


class UltraResPatientDataset:
    """One dataset per magnification level."""

    def __init__(
        self,
        slides: Dict[str, Slide],
        magnification_level: int,
        *,
        metadata: Optional[PatientMetadata] = None,
        center_cond: bool = False,
        patch_size: int = PATCH_SIZE,
        mag_sizes: Tuple[int, ...] = MAG_LEVEL_SIZES,
        fill_color: Tuple[int, int, int] = FILL_COLOR,
        test_slide_ids: Sequence[str] = (),
        more_patches: bool = True,
    ):
        self.magnification_level = magnification_level
        self.center_cond = center_cond
        self.patch_size = patch_size
        self.mag_sizes = mag_sizes
        self.fill_color = fill_color
        self.metadata = metadata

        self.train_slide_ids = [s for s in slides if s not in test_slide_ids]
        self.slides = slides

        if magnification_level > 0:
            self.patch_positions = [
                detect_tissue_patches(
                    slides[sid], patch_size, more_patches=more_patches
                )
                for sid in self.train_slide_ids
            ]
            self.num_train_patches = sum(len(p) for p in self.patch_positions)

    def __len__(self):
        if self.magnification_level == 0:
            return NUM_FLIPS_ROTATIONS * len(self.train_slide_ids)
        return NUM_FLIPS_ROTATIONS * NUM_TRANSLATIONS * self.num_train_patches

    def index_to_slide(self, patch_index: int):
        for i, positions in enumerate(self.patch_positions):
            if patch_index < len(positions):
                pos = positions[patch_index]
                return i, (int(pos[0]), int(pos[1]))
            patch_index -= len(positions)
        raise IndexError(patch_index)

    def _read_mag_zero(self, index: int) -> np.ndarray:
        """Slide-centered mag-0 square
        (ultra_res_patient_dataset.py:139-150)."""
        slide_idx = index // NUM_FLIPS_ROTATIONS
        slide = self.slides[self.train_slide_ids[slide_idx]]
        width, height = slide.size
        zoomed = self.mag_sizes[0]
        x = width // 2 - zoomed // 2
        y = height // 2 - zoomed // 2
        return read_block(
            slide, 0, x, y,
            patch_size=self.patch_size,
            mag_sizes=self.mag_sizes,
            fill_color=self.fill_color,
        )

    def __getitem__(self, index: int):
        mag = self.magnification_level
        if mag == 0:
            patch = self._read_mag_zero(index)
            return np.ascontiguousarray(flip_rotate(patch, index))

        slide_idx, (x, y) = self.index_to_slide(
            index // (NUM_FLIPS_ROTATIONS * NUM_TRANSLATIONS)
        )
        dx, dy = translation_offset(index, self.patch_size)
        x, y = x + dx, y + dy

        slide = self.slides[self.train_slide_ids[slide_idx]]
        patch, zoomed = read_block_and_zoomed(
            slide, mag, x, y,
            patch_size=self.patch_size,
            mag_sizes=self.mag_sizes,
            fill_color=self.fill_color,
        )
        patch = np.ascontiguousarray(flip_rotate(patch, index))
        zoomed = np.ascontiguousarray(flip_rotate(zoomed, index))

        if self.center_cond:
            pw = inner_patch_width(
                mag, patch_size=self.patch_size, mag_sizes=self.mag_sizes
            )
            cond = center_cond_image(zoomed, pw)
        else:
            cond = zoomed
        return patch, cond
