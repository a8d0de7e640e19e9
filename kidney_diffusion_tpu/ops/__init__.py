from .augment import (
    NUM_FLIPS_ROTATIONS,
    NUM_TRANSLATIONS,
    base_index,
    flip_rotate,
    translation_offset,
)
from .image import (
    binary_dilate,
    binary_erode,
    foreground_mask_for_patches,
    rgb_to_hsv,
    tissue_mask,
)

__all__ = [
    "NUM_FLIPS_ROTATIONS",
    "NUM_TRANSLATIONS",
    "base_index",
    "binary_dilate",
    "binary_erode",
    "flip_rotate",
    "foreground_mask_for_patches",
    "rgb_to_hsv",
    "tissue_mask",
    "translation_offset",
]
