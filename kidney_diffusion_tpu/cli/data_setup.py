"""Dataset construction from a reference-layout data directory.

Mirrors the data-loading prologue of the reference trainers
(/root/reference/train.py:130-155, train_ultra_res.py:117-142):
  <data_path>/outcomes.xlsx           patient outcomes sheet
  <data_path>/svs/*.svs               whole-slide images
  <data_path>/creatinine/<pid>.xlsx   per-patient creatinine sheets
  <data_path>/results.h5              Labelbox annotation export
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Dict, Tuple

from ..data.patient import AnnotationStore, PatientMetadata
from ..data.wsi import Slide, open_slide


def load_patient_environment(
    data_path: str, *, verbose: bool = True
) -> Tuple[Dict[str, Slide], PatientMetadata, AnnotationStore]:
    """(slides, metadata, annotations) from the reference layout."""
    import pandas as pd

    outcomes = pd.read_excel(os.path.join(data_path, "outcomes.xlsx"), "Sheet1")

    slide_paths = glob(os.path.join(data_path, "svs", "*.svs"))
    slide_ids = [re.sub(r"\.svs$", "", os.path.basename(p)) for p in slide_paths]
    outcomes = outcomes[outcomes["slide_UUID"].isin(slide_ids)]

    creatinine = {}
    for path in glob(os.path.join(data_path, "creatinine", "*.xlsx")):
        pid = re.sub(r"\.xlsx$", "", os.path.basename(path))
        creatinine[pid] = pd.read_excel(path, "Sheet1")
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
