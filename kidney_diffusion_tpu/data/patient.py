"""Kidney-biopsy patient datasets (flat patch regime).

Capability parity with /root/reference/patient_dataset.py: map-style
dataset over WSI slides + Labelbox h5 annotations with

  * per-slide tissue detection (downscale-by-patch-size + HSV threshold)
  * annotated mode: h5 raw image + per-class masks -> 4-channel labelmap
  * unannotated mode: tissue-positive patches from SVS
  * index-encoded 8 flips/rotations (x4 half-patch translations for the
    unannotated mode)
  * patient-metadata normalisation: outcome severity ladder, days post
    transplant, creatinine averaged between transplant and biopsy
  * train/test split: the 6 slides with the most annotated patches are
    held out

TPU-first deviations: returns HWC numpy float32 (NHWC device layout),
slide access goes through the `Slide` protocol (injectable backends),
and all geometry/augmentation is pure-function (ops/augment.py).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Optional, Sequence

import numpy as np

from ..ops.augment import NUM_FLIPS_ROTATIONS, NUM_TRANSLATIONS, flip_rotate, translation_offset
from ..ops.image import tissue_mask
from . import wsi
from .wsi import Slide, resize_nearest

# Kidney outcomes ordered by severity; DWFG intentionally excluded
# (it does not indicate a poor outcome) — patient_dataset.py:17
OUTCOMES = ("Functioning", "25%", "50%", "Graft_Loss", "DWGL")

# Labelbox class -> labelmap channel (1-indexed), channels merged for the
# two vessel classes — patient_dataset.py:41
LABELS = {"Tubuli": 1, "Vein": 2, "Vessel_indeterminate": 2, "Artery": 3, "Glomerui": 4}
NUM_LABEL_CHANNELS = len(set(LABELS.values()))


def normalize_outcome(x) -> float:
    return OUTCOMES.index(x) / len(OUTCOMES) if x in OUTCOMES else 0.0


def normalize_days_post_transplant(days: float) -> float:
    return (days - 90.0) / 365.0


def normalize_creatinine(value: float) -> float:
    return (value - 30.0) / 2050.0


def average_creatinine_between(
    creatinine_values: Sequence[float],
    sample_dates: Sequence,
    transplant_date,
    biopsy_date,
) -> Optional[float]:
    """Mean normalised creatinine over samples taken between transplant
    and biopsy; falls back to the all-time mean; None if no samples."""
    vals = [normalize_creatinine(v) for v in creatinine_values]
    if not vals:
        return None
    in_window = [
        v
        for v, d in zip(vals, sample_dates)
        if transplant_date <= d <= biopsy_date
    ]
    return float(np.mean(in_window)) if in_window else float(np.mean(vals))


def detect_tissue_patches(
    slide: Slide,
    patch_size: int,
    *,
    more_patches: bool = False,
) -> np.ndarray:
    """Tissue-positive patch positions: downscale the slide by
    patch_size, HSV-threshold, return (N, 2) array of (x, y) level-0
    coordinates (patient_dataset.py:126-142)."""
    width, height = slide.size
    gw, gh = max(width // patch_size, 1), max(height // patch_size, 1)
    small = slide.read_region(0, 0, width, height, gw, gh).astype(np.float32) / 255.0
    if more_patches:
        mask = np.asarray(tissue_mask(small, hue_min=0.5, sat_min=0.02))
    else:
        mask = np.asarray(tissue_mask(small, hue_min=0.8, sat_min=0.05))
    pos_rc = np.argwhere(mask)  # (row, col)
    return pos_rc[:, ::-1] * patch_size  # -> (x, y)


class PatientMetadata:
    """Normalised per-slide conditioning vectors.

    Decoupled from pandas: built from plain records so tests don't need
    Excel fixtures. Use `from_dataframes` for the reference's xlsx flow.
    """

    def __init__(self, records: Dict[str, dict]):
        """records: slide_id -> {outcome, days_post_transplant, creatinine}
        with already-normalised values."""
        self.records = records

    @classmethod
    def from_dataframes(cls, patient_outcomes, patient_creatinine) -> "PatientMetadata":
        """Build from the reference's outcomes.xlsx + per-patient
        creatinine sheets (patient_dataset.py:76-103)."""
        import pandas as pd

        records = {}
        outcomes = patient_outcomes.copy()
        outcomes["final_outcome"] = outcomes["final_outcome"].apply(normalize_outcome)
        outcomes["time_post_transplant"] = outcomes[
            "time post tx of biopsy (days)"
        ].apply(normalize_days_post_transplant)
        outcomes["date_of_biopsy"] = outcomes["Date of transplantation"] + pd.to_timedelta(
            outcomes["time post tx of biopsy (days)"], unit="d"
        )
        for _, row in outcomes.iterrows():
            patient_id = row["patient_UUID"]
            creat = None
            if patient_id in patient_creatinine:
                df = patient_creatinine[patient_id]
                creat = average_creatinine_between(
                    df["Value"].tolist(),
                    df["Sample Collected Date"].tolist(),
                    row["Date of transplantation"],
                    row["date_of_biopsy"],
                )
            records[row["slide_UUID"]] = dict(
                outcome=row["final_outcome"],
                days_post_transplant=row["time_post_transplant"],
                creatinine=creat if creat is not None else 0.2,  # default healthy
            )
        return cls(records)

    def conds(self, slide_id: Optional[str]) -> np.ndarray:
        """(1, 3) float32 conditioning vector; defaults for unknown slides
        (patient_dataset.py:261-279)."""
        if slide_id is None or slide_id not in self.records:
            return np.asarray([[0.0, 0.5, 0.2]], np.float32)
        r = self.records[slide_id]
        return np.asarray(
            [[r["outcome"], r["days_post_transplant"], r["creatinine"]]], np.float32
        )


def split_annotated_ids(h5_ids: Sequence[str], num_test_slides: int = 6):
    """Hold out the slides with the most annotated patches
    (patient_dataset.py:52-67)."""
    counts = Counter(x.split(" ")[0] for x in h5_ids)
    test_slides = [s for s, _ in counts.most_common(num_test_slides)]
    train, test = [], []
    for x in h5_ids:
        (test if any(t in x for t in test_slides) else train).append(x)
    return train, test, test_slides


class AnnotationStore:
    """Labelbox h5 access: annotated patch ids, raw images, labelmaps."""

    def __init__(self, h5_path: str):
        self.h5_path = h5_path

    def list_ids(self) -> list:
        import h5py

        ids = []
        with h5py.File(self.h5_path, "r") as h5:
            for name, cut in h5.items():
                if any(k in cut.keys() for k in LABELS):
                    if not name.endswith("_0"):  # omit repeated annotations
                        ids.append(name)
        return ids

    def load(self, patch_id: str, labelmap_size: int = 1024):
        import h5py

        labelmap = np.zeros((labelmap_size, labelmap_size, NUM_LABEL_CHANNELS), np.float32)
        with h5py.File(self.h5_path, "r") as h5:
            group = h5[patch_id]
            patch = np.array(group.get("rawimage"))[..., :3]
            for name, channel in LABELS.items():
                if name in group.keys():
                    mask = np.array(group.get(name))
                    labelmap[mask > 0, channel - 1] = 1.0
        return patch.astype(np.float32) / 255.0, labelmap


class PatientDataset:
    """Flat-regime dataset (annotated or unannotated)."""

    def __init__(
        self,
        slides: Dict[str, Slide],
        metadata: PatientMetadata,
        *,
        annotations: Optional[AnnotationStore] = None,
        annotated_dataset: bool = False,
        patch_size: int = 1024,
        image_size: int = 1024,
        transformations: bool = True,
        unconditional: bool = False,
        more_patches: bool = False,
        test_slide_ids: Sequence[str] = (),
    ):
        self.slides = slides
        self.metadata = metadata
        self.annotations = annotations
        self.annotated_dataset = annotated_dataset
        self.patch_size = patch_size
        self.image_size = image_size
        self.transformations = transformations
        self.unconditional = unconditional

        if annotated_dataset:
            assert annotations is not None
            ids = annotations.list_ids()
            self.train_h5_ids, self.test_h5_ids, _ = split_annotated_ids(ids)
        else:
            self.train_slide_ids = []
            self.patch_positions = []
            for sid, slide in slides.items():
                if sid in test_slide_ids:
                    continue
                pos = detect_tissue_patches(slide, patch_size, more_patches=more_patches)
                self.train_slide_ids.append(sid)
                self.patch_positions.append(pos)
            self.num_train_patches = sum(len(p) for p in self.patch_positions)

    def __len__(self):
        mult = NUM_FLIPS_ROTATIONS if self.transformations else 1
        if self.annotated_dataset:
            return mult * len(self.train_h5_ids)
        mult *= NUM_TRANSLATIONS if self.transformations else 1
        return mult * self.num_train_patches

    def index_to_slide(self, patch_index: int):
        for i, positions in enumerate(self.patch_positions):
            if patch_index < len(positions):
                return i, tuple(positions[patch_index])
            patch_index -= len(positions)
        raise IndexError(patch_index)

    def __getitem__(self, index: int):
        labelmap = np.zeros((1024, 1024, NUM_LABEL_CHANNELS), np.float32)
        slide_id: Optional[str] = None

        if self.annotated_dataset:
            per = NUM_FLIPS_ROTATIONS if self.transformations else 1
            pid = self.train_h5_ids[index // per]
            patch, labelmap = self.annotations.load(pid)
            slide_id = pid.split(" ")[0]
            slide_id = slide_id if slide_id in self.metadata.records else None
        else:
            per = (NUM_FLIPS_ROTATIONS * NUM_TRANSLATIONS) if self.transformations else 1
            slide_idx, (x, y) = self.index_to_slide(index // per)
            if self.transformations:
                dx, dy = translation_offset(index, self.patch_size)
                x, y = x + dx, y + dy
            slide = self.slides[self.train_slide_ids[slide_idx]]
            # clamp+fill read: a translated patch straddling the slide
            # edge comes back edge-filled at true geometry, never
            # stretched (wsi.read_region_filled; matches slideio's
            # read_block padding semantics)
            region = wsi.read_region_filled(
                slide, int(x), int(y), self.patch_size, self.patch_size,
                self.image_size, self.image_size,
            )
            patch = region.astype(np.float32) / 255.0
            slide_id = self.train_slide_ids[slide_idx]

        k = index if self.transformations else 0
        patch = np.ascontiguousarray(flip_rotate(patch, k))
        if self.unconditional:
            return patch
        labelmap = np.ascontiguousarray(flip_rotate(labelmap, k))
        conds = self.metadata.conds(slide_id)
        return patch, conds, labelmap
