#!/usr/bin/env python
"""Throughput bench for the C++ native data engine (host-side, no TPU).

Quantifies what the native engine buys over the pure-Python fallbacks —
the role slideio's C++ core plays for the reference
(/root/reference/patient_dataset.py:118: per-patch `read_block` during
training must keep up with the accelerator).

Three measurements on a synthetic JPEG-tiled SVS pyramid:
  1. cold-open first-patch latency: native decodes only the tiles under
     the region; the PIL fallback must decode the WHOLE level first
  2. steady-state random-region decode throughput (regions/sec)
  3. fused patch extraction (crop+resize+augment) vs a numpy equivalent

Prints one JSON line per measurement; run with /opt/venv/bin/python.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from kidney_diffusion_tpu.data import native
from kidney_diffusion_tpu.data.tiff_writer import write_synthetic_svs

SLIDE = 8192          # level-0 side
REGION = 1024         # decoded region side
OUT = 1024            # resampled output side
N_REGIONS = 32
N_PATCH = 256         # fused-extract batch
PATCH = 256


def synthetic_slide(path):
    rng = np.random.default_rng(0)
    base = rng.integers(180, 250, (SLIDE, SLIDE, 3), np.uint8)
    # blobs so JPEG tiles aren't trivially uniform
    for _ in range(200):
        y, x = rng.integers(0, SLIDE - 256, 2)
        base[y : y + 256, x : x + 256] = rng.integers(90, 200, 3)
    write_synthetic_svs(path, base, levels=3)
    return base


def emit(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 2), "unit": unit, **extra}), flush=True)


def main():
    assert native.available(), "native engine not built (make -C native)"
    tmp = tempfile.mkdtemp(prefix="kdt_native_bench_")
    path = os.path.join(tmp, "bench.svs")
    base = synthetic_slide(path)
    rng = np.random.default_rng(1)
    xs = rng.integers(0, SLIDE - REGION, N_REGIONS)
    ys = rng.integers(0, SLIDE - REGION, N_REGIONS)

    # 1. cold-open first-patch latency
    t0 = time.perf_counter()
    s = native.NativeSlide(path)
    first = s.read_region(int(xs[0]), int(ys[0]), REGION, REGION, OUT, OUT)
    native_cold = time.perf_counter() - t0
    emit("native_cold_first_patch", native_cold * 1e3, "ms")

    from PIL import Image

    t0 = time.perf_counter()
    whole = np.asarray(Image.open(path))  # the fallback's whole-level decode
    _ = whole[ys[0] : ys[0] + REGION, xs[0] : xs[0] + REGION]
    pil_cold = time.perf_counter() - t0
    emit("pil_fallback_cold_first_patch", pil_cold * 1e3, "ms",
         speedup=round(pil_cold / native_cold, 1))

    # 2. steady-state random-region decode
    t0 = time.perf_counter()
    for x, y in zip(xs, ys):
        s.read_region(int(x), int(y), REGION, REGION, OUT, OUT)
    dt = time.perf_counter() - t0
    emit("native_region_decode", N_REGIONS / dt, "regions/sec")

    # 3. fused extract+RESIZE+augment batch vs a PIL/numpy equivalent —
    # the production shape: ultra-res zoomed-context crops read a
    # variable-size region and resample it to the training patch size
    # (data/ultra_res.py; reference ultra_res_patient_dataset.py:154-200)
    aug = rng.integers(0, 8, N_PATCH).astype(np.int32)
    regions = rng.integers(PATCH, 4 * PATCH, N_PATCH).astype(np.int64)
    pxs = rng.integers(-64, SLIDE - PATCH + 64, N_PATCH)  # includes OOB edges
    pys = rng.integers(-64, SLIDE - PATCH + 64, N_PATCH)

    t0 = time.perf_counter()
    native.extract_batch(base, pxs, pys, regions, PATCH, aug=aug)
    dt_native = time.perf_counter() - t0
    emit("native_fused_extract_resize", N_PATCH / dt_native, "patches/sec")

    from PIL import Image as PILImage

    def python_extract(x, y, r, a):
        patch = np.full((r, r, 3), (242, 243, 242), np.uint8)
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + r, SLIDE), min(y + r, SLIDE)
        if x1 > x0 and y1 > y0:
            patch[y0 - y : y1 - y, x0 - x : x1 - x] = base[y0:y1, x0:x1]
        if r != PATCH:
            patch = np.asarray(
                PILImage.fromarray(patch).resize((PATCH, PATCH), PILImage.BILINEAR)
            )
        if a & 1:
            patch = patch[:, ::-1]
        if a & 2:
            patch = patch[::-1]
        if a & 4:
            patch = patch.transpose(1, 0, 2)
        return np.ascontiguousarray(patch)

    t0 = time.perf_counter()
    np.stack([
        python_extract(int(x), int(y), int(r), int(a))
        for x, y, r, a in zip(pxs, pys, regions, aug)
    ])
    dt_py = time.perf_counter() - t0
    emit("python_extract_resize", N_PATCH / dt_py, "patches/sec",
         native_speedup=round(dt_py / dt_native, 1))

    s.close()


if __name__ == "__main__":
    main()
