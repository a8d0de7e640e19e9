"""Paired eval-patch exporter — equivalent of /root/reference/patch.py.

Samples scale-matched random crops from real SVS slides and fake
gigapixel JPGs (same crop transformation reused across each pair).
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

from ..data.wsi import ArraySlide, SlideioSlide
from ..eval.patch_sampler import export_pairs


def _load_fake(path) -> ArraySlide:
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as im:
        return ArraySlide(np.asarray(im.convert("RGB"), np.uint8))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real_path", type=str, required=True, help="dir of .svs")
    p.add_argument("--fake_path", type=str, required=True, help="dir of .jpg")
    p.add_argument("--real_output", type=str, required=True)
    p.add_argument("--fake_output", type=str, required=True)
    p.add_argument("--num_files", type=int, required=True)
    p.add_argument("--size_max", type=int, required=True)
    p.add_argument("--size_min", type=int, required=True)
    p.add_argument("--patch_size", type=int, required=True)
    p.add_argument("--num_workers", type=int, default=16)
    args = p.parse_args()

    real_files = sorted(pathlib.Path(args.real_path).glob("*.svs"))
    fake_files = sorted(pathlib.Path(args.fake_path).glob("*.jpg"))
    print(f"sampling from {len(real_files)} real and {len(fake_files)} fake files")

    real_slides = [SlideioSlide(str(f)) for f in real_files]
    fake_slides = [_load_fake(f) for f in fake_files]

    export_pairs(
        real_slides, fake_slides,
        num_files=args.num_files, patch_size=args.patch_size,
        size_min=args.size_min, size_max=args.size_max,
        real_output=args.real_output, fake_output=args.fake_output,
        num_workers=args.num_workers,
    )


if __name__ == "__main__":
    main()
