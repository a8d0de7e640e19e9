"""Real-patch exporter — equivalent of /root/reference/generate_patches.py.

Dumps every untransformed dataset patch to PNGs under <output>/real/,
building the FID reference set.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..data.patient import PatientDataset
from ..utils.logging import save_image
from .data_setup import load_patient_environment


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--output", type=str, default="real")
    p.add_argument("--annotated_dataset", action="store_true",
                   help="export the annotated (labelbox h5) patches instead "
                        "of tissue-positive SVS patches "
                        "(generate_patches.py:48,66)")
    p.add_argument("--num_workers", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    slides, metadata, annotations = load_patient_environment(args.data_path)
    dataset = PatientDataset(
        slides, metadata, annotations=annotations,
        annotated_dataset=args.annotated_dataset,
        patch_size=1024, image_size=1024,
        transformations=False, unconditional=True,
    )
    n = len(dataset) if args.limit is None else min(args.limit, len(dataset))
    os.makedirs(args.output, exist_ok=True)
    print(f"exporting {n} patches to {args.output}")

    def job(i: int):
        patch = dataset[i]
        save_image(np.asarray(patch), os.path.join(args.output, f"{i}.png"))

    with ThreadPoolExecutor(max_workers=args.num_workers) as pool:
        list(pool.map(job, range(n)))


if __name__ == "__main__":
    main()
