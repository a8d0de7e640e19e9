"""Index-encoded deterministic augmentation (pure functions).

The reference encodes its augmentation in the dataset index: 8 dihedral
flips/rotations × 4 half-patch translations
(/root/reference/patient_dataset.py:13-14,221-233,243-297,
ultra_res_patient_dataset.py:230-246). Re-derived here for HWC numpy
arrays as pure, unit-testable functions.

Torch-CHW to numpy-HWC mapping: torch `flip(2)` = flip width (axis 1),
`flip(1)` = flip height (axis 0), `transpose(1, 2)` = swap H and W.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

NUM_FLIPS_ROTATIONS = 8
NUM_TRANSLATIONS = 4


def flip_rotate(patch: np.ndarray, index: int) -> np.ndarray:
    """Apply dihedral transform #(index % 8) to an HWC (or HW) array."""
    k = index % NUM_FLIPS_ROTATIONS
    if k == 0:
        return patch
    if k == 1:
        return patch[:, ::-1]
    if k == 2:
        return patch[::-1, :]
    if k == 3:
        return patch[::-1, ::-1]
    t = np.swapaxes(patch, 0, 1)
    if k == 4:
        return t
    if k == 5:
        return t[:, ::-1]
    if k == 6:
        return t[::-1, :]
    return t[::-1, ::-1]


def translation_offset(index: int, patch_size: int) -> Tuple[int, int]:
    """(dx, dy) half-patch translation for transform-encoded indices.

    index layout: index // NUM_FLIPS_ROTATIONS cycles the translation
    (/root/reference/patient_dataset.py:221-233)."""
    t = (index // NUM_FLIPS_ROTATIONS) % NUM_TRANSLATIONS
    half = patch_size // 2
    if t == 0:
        return 0, 0
    if t == 1:
        return half, 0
    if t == 2:
        return half, half
    return 0, half


def base_index(index: int, *, with_translations: bool) -> int:
    """Recover the underlying patch index from a transform-encoded index."""
    per = NUM_FLIPS_ROTATIONS * (NUM_TRANSLATIONS if with_translations else 1)
    return index // per
