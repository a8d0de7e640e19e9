"""Generic image-folder dataset (parity with /root/reference/data.py,
which mirrors imagen-pytorch's own data utilities and is imported by
nothing in-repo — kept for API completeness).

Resize, optional horizontal flip, center crop, grayscale -> 3 channels.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from .wsi import resize_nearest

EXTS = ("jpg", "jpeg", "png", "tiff", "tif", "bmp")


class ImageFolderDataset:
    def __init__(
        self,
        folder: str,
        image_size: int,
        *,
        exts: Sequence[str] = EXTS,
        random_flip: bool = True,
        center_crop: bool = True,
        seed: int = 0,
    ):
        self.paths = sorted(
            p for ext in exts for p in Path(folder).glob(f"**/*.{ext}")
        )
        assert self.paths, f"no images found in {folder}"
        self.image_size = image_size
        self.random_flip = random_flip
        self.center_crop = center_crop
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> np.ndarray:
        from PIL import Image

        with Image.open(self.paths[index]) as im:
            img = np.asarray(im.convert("RGB"), dtype=np.uint8)

        if self.center_crop:
            h, w = img.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            img = img[y0 : y0 + s, x0 : x0 + s]
        img = resize_nearest(img, self.image_size, self.image_size)
        if self.random_flip and self.rng.random() < 0.5:
            img = img[:, ::-1]
        return np.ascontiguousarray(img, dtype=np.float32) / 255.0


def cycle(loader):
    """Endless iteration helper (reference data.py exposes the same)."""
    while True:
        for item in loader:
            yield item
