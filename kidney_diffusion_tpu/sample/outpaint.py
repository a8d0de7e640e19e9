"""Outpainting: unconditional gigapixel-style generation without a
coarse guide (/root/reference/outpainting.py).

The full N×N grid is generated with the same wavefront + overlap-inpaint
machinery as the ultra-res sampler, except there are no conditioning
images — neighbour strips only ever come from already-generated patches
(outpainting.py:102-108) — and the final canvas starts from zeros
(outpainting.py:234-241).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..cascade import Cascade
from ..data.wsi import PATCH_SIZE
from .gigapixel import GridSpec, generate_patch_set
from .wavefront import full_grid


def generate_outpainted_image(
    cascade: Cascade,
    params_per_stage: Sequence,
    key,
    *,
    num_patches_width: int,
    overlap: float = 0.25,
    inpaint_resample_times: int = 1,
    max_wave_batch: int = 32,
    patch_size: int = PATCH_SIZE,
    progress: bool = True,
    ddim_steps: int = 0,
    dpmpp_steps: int = 0,
    wire: Optional[str] = "uint8",
) -> np.ndarray:
    """Generate an (W, W, 3) uint8 image, W = patch_size + (N-1)·dist."""
    patch_pos = full_grid(num_patches_width)
    # the grid lives directly at output resolution: patch_width equals the
    # model patch size (no coarse image to embed into)
    grid = GridSpec(
        patch_width=patch_size,
        patch_dist=int(patch_size * (1 - overlap)),
        num_patches_width=num_patches_width,
        overlap=overlap,
    )
    patches = generate_patch_set(
        cascade,
        params_per_stage,
        key,
        patch_pos=patch_pos,
        grid=grid,
        cond_images=None,
        inpaint_resample_times=inpaint_resample_times,
        max_wave_batch=max_wave_batch,
        progress=progress,
        ddim_steps=ddim_steps,
        dpmpp_steps=dpmpp_steps,
        wire=wire,
    )

    patch_dist = grid.patch_dist
    full = patch_size + (num_patches_width - 1) * patch_dist
    canvas = np.zeros((full, full, 3), np.uint8)
    for (i, j), patch in patches.items():
        y, x = i * patch_dist, j * patch_dist
        canvas[y : y + patch_size, x : x + patch_size] = np.clip(
            patch.astype(np.float32) * 255.0, 0, 255
        ).astype(np.uint8)
    return canvas
