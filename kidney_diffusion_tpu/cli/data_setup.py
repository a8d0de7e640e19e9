"""Dataset construction from a reference-layout data directory.

Mirrors the data-loading prologue of the reference trainers
(/root/reference/train.py:130-155, train_ultra_res.py:117-142):
  <data_path>/outcomes.xlsx           patient outcomes sheet
  <data_path>/svs/*.svs               whole-slide images
  <data_path>/creatinine/<pid>.xlsx   per-patient creatinine sheets
  <data_path>/results.h5              Labelbox annotation export

The sheets may equivalently be .csv files (same columns; date columns
parsed with pd.to_datetime). pandas needs an extra engine (openpyxl)
for .xlsx; minimal images often lack it, and the csv path keeps the
full prologue runnable/testable there. When both exist, .xlsx wins
unless its engine is missing.
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Dict, Tuple

from ..data.patient import AnnotationStore, PatientMetadata
from ..data.wsi import Slide, open_slide


def _read_sheet(base_path: str, date_columns: Tuple[str, ...] = ()):
    """Read `<base_path>.xlsx` (Sheet1, reference format) or
    `<base_path>.csv` — whichever exists, xlsx preferred. Falls back to
    the csv when the xlsx engine (openpyxl) isn't installed."""
    import pandas as pd

    xlsx, csv = base_path + ".xlsx", base_path + ".csv"
    if os.path.exists(xlsx):
        try:
            return pd.read_excel(xlsx, "Sheet1")
        except ImportError:
            if not os.path.exists(csv):
                raise ImportError(
                    f"reading {xlsx} needs an xlsx engine (openpyxl); "
                    f"install one or provide {csv} with the same columns"
                )
    if not os.path.exists(csv):
        raise FileNotFoundError(f"{xlsx} (or {csv}) not found")
    df = pd.read_csv(csv)
    for col in date_columns:
        if col in df.columns:
            df[col] = pd.to_datetime(df[col])
    return df


def load_patient_environment(
    data_path: str, *, verbose: bool = True
) -> Tuple[Dict[str, Slide], PatientMetadata, AnnotationStore]:
    """(slides, metadata, annotations) from the reference layout."""
    outcomes = _read_sheet(
        os.path.join(data_path, "outcomes"),
        date_columns=("Date of transplantation",),
    )

    slide_paths = glob(os.path.join(data_path, "svs", "*.svs"))
    slide_ids = [re.sub(r"\.svs$", "", os.path.basename(p)) for p in slide_paths]
    outcomes = outcomes[outcomes["slide_UUID"].isin(slide_ids)]

    creatinine = {}
    for path in sorted(glob(os.path.join(data_path, "creatinine", "*.xlsx"))) + sorted(
        glob(os.path.join(data_path, "creatinine", "*.csv"))
    ):
        pid = re.sub(r"\.(xlsx|csv)$", "", os.path.basename(path))
        if pid in creatinine:  # .xlsx listed first and wins
            continue
        creatinine[pid] = _read_sheet(
            os.path.splitext(path)[0],
            date_columns=("Sample Collected Date",),
        )
    creatinine = {
        k: v for k, v in creatinine.items() if k in outcomes["patient_UUID"].values
    }

    if verbose:
        print(f"Found {len(outcomes)} patients with SVS files")

    metadata = PatientMetadata.from_dataframes(outcomes, creatinine)
    slides = {
        sid: open_slide(os.path.join(data_path, "svs", sid + ".svs"))
        for sid in outcomes["slide_UUID"]
    }
    annotations = AnnotationStore(os.path.join(data_path, "results.h5"))
    return slides, metadata, annotations
