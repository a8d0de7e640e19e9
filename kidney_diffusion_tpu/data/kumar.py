"""Kumar multi-organ nuclei dataset.

Capability parity with /root/reference/kumar_dataset.py: npy patch +
binary-mask pairs with CSV metadata, normalised (type, disease)
conditioning, random 256² crops, and the 8-flip/rotation x 4-crop
index-encoded augmentation.

TPU-first deviations: HWC numpy output (no torch, no `.cuda()` inside
the dataset — the reference creates CUDA tensors in worker processes,
kumar_dataset.py:57-58, which is exactly the host/device churn this
build removes) and a seeded per-index RNG so crops are reproducible.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

from ..ops.augment import NUM_FLIPS_ROTATIONS, flip_rotate

NUM_RANDOM_CROPS = 4

TYPES = ("Breast", "Kidney", "Liver", "Prostate", "Bladder", "Colon", "Stomach")
DISEASES = (
    "Breast invasive carcinoma",
    "Kidney renal clear cell carcinoma",
    "Kidney renal papillary cell carcinoma",
    "Lung squamous cell carcinoma",
    "Lung adenocarcinoma",
    "Prostate adenocarcinoma",
    "Bladder Urothelial Carcinoma",
    "Colon adenocarcinoma",
    "Stomach adenocarcinoma",
)


def normalize_type(x: str) -> float:
    return TYPES.index(x) / len(TYPES)


def normalize_disease(x: str) -> float:
    return DISEASES.index(x) / len(DISEASES)


class KumarDataset:
    """Layout (matching the reference's expectations,
    kumar_dataset.py:34-40):
        <data_path>/Supplementary/supplementary.csv   (';'-separated,
            columns ID / Type / Disease)
        <data_path>/Patches/<id[:-1]>.npy             (HWC uint8-ish)
        <data_path>/Labels/<id>binary_mask.npy        (HW or HWC)
    """

    def __init__(self, data_path: str, *, patch_size: int = 256, seed: int = 0):
        import pandas as pd

        self.data_path = data_path
        self.patch_size = patch_size
        self.seed = seed

        df = pd.read_csv(
            os.path.join(data_path, "Supplementary", "supplementary.csv"),
            delimiter=";",
        )
        for pid in df["ID"]:
            if not Path(data_path, "Patches", pid[:-1] + ".npy").is_file():
                print(f"Patch {pid} missing")
            if not Path(data_path, "Labels", pid + "binary_mask.npy").is_file():
                print(f"Label {pid} missing")
        self.ids = df["ID"].tolist()
        self.types = df["Type"].apply(normalize_type).tolist()
        self.diseases = df["Disease"].apply(normalize_disease).tolist()
        self.num_patches = len(self.ids)

    def __len__(self):
        return NUM_FLIPS_ROTATIONS * NUM_RANDOM_CROPS * self.num_patches

    def __getitem__(self, index: int):
        patch_index = index // (NUM_FLIPS_ROTATIONS * NUM_RANDOM_CROPS)
        pid = self.ids[patch_index]

        patch = np.load(os.path.join(self.data_path, "Patches", pid[:-1] + ".npy"))
        labelmap = np.load(
            os.path.join(self.data_path, "Labels", pid + "binary_mask.npy")
        )
        if labelmap.ndim == 2:
            labelmap = labelmap[..., None]
        patch = patch.astype(np.float32) / 255.0
        labelmap = labelmap.astype(np.float32)

        # seeded random crop: distinct per (patch, crop-slot), stable
        # across epochs
        crop_slot = (index // NUM_FLIPS_ROTATIONS) % NUM_RANDOM_CROPS
        rng = np.random.default_rng((self.seed, patch_index, crop_slot))
        h, w = patch.shape[:2]
        ps = self.patch_size
        y0 = int(rng.integers(0, max(h - ps, 0) + 1))
        x0 = int(rng.integers(0, max(w - ps, 0) + 1))
        patch = patch[y0 : y0 + ps, x0 : x0 + ps]
        labelmap = labelmap[y0 : y0 + ps, x0 : x0 + ps]

        patch = np.ascontiguousarray(flip_rotate(patch, index))
        labelmap = np.ascontiguousarray(flip_rotate(labelmap, index))
        conds = np.asarray(
            [[self.types[patch_index], self.diseases[patch_index]]], np.float32
        )
        return patch, conds, labelmap
