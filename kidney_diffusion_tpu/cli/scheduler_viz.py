"""Wavefront-scheduler visualizer — equivalent of
/root/reference/sample_ultra_res_testing.py.

Runs tissue masking + wavefront scheduling WITHOUT any model and renders
the wave order as PNG frames (green = this wave, gray = done, red =
waiting) — the de-facto scheduler test of the reference, made headless.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..sample.gigapixel import GridSpec, tissue_patch_filter
from ..sample.wavefront import choose_orientation, full_grid, plan_waves


def render_frames(
    patch_pos, waves, grid: GridSpec, out_dir: str, image=None
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches as mpatches

    os.makedirs(out_dir, exist_ok=True)
    done = set()
    for wi, wave in enumerate(waves):
        fig, ax = plt.subplots(figsize=(8, 8))
        if image is not None:
            ax.imshow(image)
        extent = grid.patch_dist * grid.num_patches_width + grid.patch_width
        ax.set_xlim(0, extent)
        ax.set_ylim(extent, 0)
        for pos in patch_pos:
            i, j = pos
            if pos in wave:
                color = "green"
            elif pos in done:
                color = "gray"
            else:
                color = "red"
            ax.add_patch(
                mpatches.Rectangle(
                    (j * grid.patch_dist, i * grid.patch_dist),
                    grid.patch_width, grid.patch_width,
                    linewidth=1.5, edgecolor=color, facecolor=color, alpha=0.35,
                )
            )
        ax.set_title(f"wave {wi + 1}/{len(waves)} — {len(wave)} patches")
        fig.savefig(os.path.join(out_dir, f"wave_{wi:03d}.png"), dpi=80)
        plt.close(fig)
        done.update(wave)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", type=str, default=None,
                   help="optional coarse image (jpg/png) for tissue filtering")
    p.add_argument("--mag_level", type=int, default=2)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--num_patches_width", type=int, default=8,
                   help="grid size when no image is given")
    p.add_argument("--output", type=str, default="scheduler_viz")
    args = p.parse_args()

    if args.image:
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None
        with Image.open(args.image) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        grid = GridSpec.build(img.shape[1], args.mag_level, args.overlap)
        patch_pos = tissue_patch_filter(img, grid)
    else:
        img = None
        grid = GridSpec(
            patch_width=166, patch_dist=int(166 * (1 - args.overlap)),
            num_patches_width=args.num_patches_width, overlap=args.overlap,
        )
        patch_pos = full_grid(args.num_patches_width)

    orientation = choose_orientation(patch_pos)
    waves = plan_waves(patch_pos, orientation)
    print(
        f"{len(patch_pos)} patches, orientation {orientation}, {len(waves)} waves; "
        f"wave sizes: {[len(w) for w in waves]}"
    )
    render_frames(patch_pos, waves, grid, args.output, image=img)
    print(f"frames in {args.output}/")


if __name__ == "__main__":
    main()
