"""Dataset debug dumper — equivalent of /root/reference/train_debug.py.

No training: iterate an ultra-res dataset and save the first N patches
(plus their zoomed conditioning) as PNGs for eyeballing.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.ultra_res import UltraResPatientDataset
from ..utils.logging import save_image
from .data_setup import load_patient_environment


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--magnification_level", type=int, choices=(0, 1, 2), required=True)
    p.add_argument("--center_cond", action="store_true")
    p.add_argument("--output", type=str, default="debug_patches")
    p.add_argument("--num", type=int, default=100)
    args = p.parse_args()

    slides, metadata, _ = load_patient_environment(args.data_path)
    dataset = UltraResPatientDataset(
        slides, args.magnification_level, metadata=metadata,
        center_cond=args.center_cond,
    )
    os.makedirs(args.output, exist_ok=True)
    n = min(args.num, len(dataset))
    for i in range(n):
        item = dataset[i]
        if isinstance(item, tuple):
            patch, cond = item
            save_image(patch, os.path.join(args.output, f"{i}_patch.png"))
            save_image(cond[..., :3], os.path.join(args.output, f"{i}_zoomed.png"))
            if cond.shape[-1] > 3:
                save_image(cond[..., 3:6], os.path.join(args.output, f"{i}_center.png"))
        else:
            save_image(item, os.path.join(args.output, f"{i}_patch.png"))
    print(f"dumped {n} items to {args.output}")


if __name__ == "__main__":
    main()
