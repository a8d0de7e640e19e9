"""End-to-end gigapixel wall-clock benchmark on the attached TPU chip.

Everything in BENCH_DETAILS.json is derived from scan-amortized
per-denoise-step latencies; nothing had ever timed the FULL production
pipeline — wavefront planning, per-wave cond-image recentering, RePaint
strip assembly, host<->device transfers, stitch — as the user runs it
(`cli.sample_ultra_res`, the reference's sample_ultra_res.py flow).
This tool measures exactly that, on the shipped serving configuration
(stages 1/2 dpmpp-25, stage-3 distilled-student ddim-4 on the
w8a8-int8 + fp8-storage path — artifacts/r3_cascade_distill).

Protocol:
  * mag 0: one full-cascade 1024² overview patch (cold, incl. compile)
  * mag 1: full 8x8 refinement grid over the mag-0 image (cold)
  * mag 2: an NxN grid (default 11x11 = 121 patches, tissue filter off —
    fresh params carry no tissue signal) run TWICE with the same jit
    caches: run 1 = cold (compiles + XLA disk cache), run 2 = warm =
    the sustained end-to-end number the headline should be compared to.

Params are zeros from eval_shape (dense-compute timing is
value-independent; on-device init of ~1.3B params over the tunnel costs
minutes and changes nothing). Run via nohup — NEVER under `timeout`
(a killed TPU process backs up the tunnel ~10 min):

    nohup /opt/venv/bin/python tools/gigapixel_wall.py \
        --out artifacts/r3_gigapixel_wall > /tmp/gwall.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def zeros_params(cascade):
    out = []
    for stage in range(1, cascade.config.num_stages + 1):
        shapes = jax.eval_shape(
            lambda s=stage: cascade.init_stage_params(jax.random.PRNGKey(s), s)
        )
        out.append(jax.tree.map(lambda s: jax.numpy.zeros(s.shape, s.dtype), shapes))
    return out


def build_level(mag: int, version: str, quant, storage, smoke: bool = False):
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import (
        serving_overrides,
        tiny_test_cascade,
        ultra_res,
    )

    if smoke:
        cfg = tiny_test_cascade(
            cond_images_channels=3 if mag > 0 else 0
        )
    else:
        cfg = serving_overrides(
            ultra_res(mag, version), quant=quant, storage=storage
        )
    cascade = Cascade(cfg)
    return cascade, zeros_params(cascade)


# smoke mode shrinks the magnification pyramid to the tiny test cascade's
# 32² patch size (real pyramid: data/wsi.py MAG_LEVEL_SIZES)
SMOKE_MAG_SIZES = (320, 104, 32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="artifacts/r3_gigapixel_wall")
    p.add_argument("--version", type=str, default="v_param")
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--inpaint_resample", type=int, default=1)
    p.add_argument("--max_wave_batch", type=int, default=32)
    p.add_argument("--mag2_grid", type=int, default=11,
                   help="mag-2 runs an NxN patch grid (the mag-1 canvas is "
                        "cropped so the grid is exactly NxN — realistic "
                        "wave widths without a 2800-patch full slide)")
    p.add_argument("--dpmpp_steps", type=int, nargs="+", default=[25, 25, 0])
    p.add_argument("--ddim_steps", type=int, nargs="+", default=[0, 0, 4])
    p.add_argument("--quant", type=str, default="int8")
    p.add_argument("--wire", type=str, default="resident",
                   choices=["resident", "uint8", "fp32"])
    p.add_argument("--storage", type=str, default="float8_e4m3fn")
    p.add_argument("--s3_batch", type=int, default=1,
                   help="final-stage wave batch (dispatch-vs-compute "
                        "trade over the tunnel; see final_stage_batch)")
    p.add_argument("--smoke", action="store_true",
                   help="CPU plumbing check: tiny cascades, tiny pyramid")
    args = p.parse_args()
    quant = None if args.quant == "none" else args.quant
    storage = None if args.storage == "none" else args.storage
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.mag2_grid = min(args.mag2_grid, 3)
        args.dpmpp_steps, args.ddim_steps = [4, 0], [0, 2]
    else:
        from kidney_diffusion_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()

    from kidney_diffusion_tpu.data.wsi import MAG_LEVEL_SIZES
    from kidney_diffusion_tpu.sample.gigapixel import (
        GridSpec,
        generate_high_res_image,
    )

    mag_sizes = SMOKE_MAG_SIZES if args.smoke else MAG_LEVEL_SIZES

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(0)
    metrics = {
        "serving": {
            "dpmpp_steps": args.dpmpp_steps,
            "ddim_steps": args.ddim_steps,
            "quant": args.quant,
            "activation_storage": args.storage,
            "overlap": args.overlap,
            "inpaint_resample": args.inpaint_resample,
            "max_wave_batch": args.max_wave_batch,
            "wire": args.wire,
            "s3_batch": args.s3_batch,
        },
        "levels": {},
    }

    # ---- mag 0: one full-cascade overview patch -------------------------
    cascade0, params0 = build_level(0, args.version, quant, storage, args.smoke)
    key, sk = jax.random.split(key)
    t0 = time.perf_counter()
    mag0 = np.asarray(
        cascade0.sample(
            params0, sk, batch_size=1,
            dpmpp_steps=args.dpmpp_steps, ddim_steps=args.ddim_steps,
        )
    )[0]
    t_mag0 = time.perf_counter() - t0
    metrics["levels"]["mag0"] = {"patches": 1, "wall_s": t_mag0, "cold": True}
    print(f"[wall] mag0: {t_mag0:.1f} s (cold, 1 patch)", flush=True)
    del cascade0, params0

    # ---- mag 1: full grid over the 1024² overview -----------------------
    cascade1, params1 = build_level(1, args.version, quant, storage, args.smoke)
    key, sk = jax.random.split(key)
    t0 = time.perf_counter()
    mag1 = generate_high_res_image(
        cascade1, params1, sk, mag0.astype(np.float32), 1,
        overlap=args.overlap, mag_sizes=mag_sizes,
        inpaint_resample_times=args.inpaint_resample,
        max_wave_batch=args.max_wave_batch,
        dpmpp_steps=args.dpmpp_steps, ddim_steps=args.ddim_steps,
        wire=None if args.wire == "fp32" else args.wire,
    )
    t_mag1 = time.perf_counter() - t0
    ps1 = cascade1.config.stages[-1].image_size
    grid1 = GridSpec.build(mag0.shape[1], 1, args.overlap, mag_sizes=mag_sizes, patch_size=ps1)
    n1 = grid1.num_patches_width ** 2
    metrics["levels"]["mag1"] = {
        "patches": n1,
        "grid": grid1.num_patches_width,
        "wall_s": t_mag1,
        "patches_per_sec": n1 / t_mag1,
        "cold": True,
        "canvas": list(mag1.shape),
    }
    print(
        f"[wall] mag1: {t_mag1:.1f} s (cold, {n1} patches, "
        f"{n1 / t_mag1:.3f} patches/s, canvas {mag1.shape})",
        flush=True,
    )
    del cascade1, params1

    # ---- mag 2: NxN grid, cold then warm --------------------------------
    cascade2, params2 = build_level(2, args.version, quant, storage, args.smoke)
    zoomed = mag1.astype(np.float32) / 255.0
    grid2 = GridSpec.build(zoomed.shape[1], 2, args.overlap, mag_sizes=mag_sizes, patch_size=cascade2.config.stages[-1].image_size)
    want_w = grid2.patch_width + (args.mag2_grid - 1) * grid2.patch_dist
    if zoomed.shape[1] < want_w:
        raise SystemExit(
            f"mag1 canvas {zoomed.shape[1]} px can't host a "
            f"{args.mag2_grid}x{args.mag2_grid} mag-2 grid ({want_w} px)"
        )
    zoomed = zoomed[:want_w, :want_w]
    n2 = args.mag2_grid ** 2

    for label in ("cold", "warm"):
        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        mag2 = generate_high_res_image(
            cascade2, params2, sk, zoomed, 2,
            overlap=args.overlap, mag_sizes=mag_sizes,
            inpaint_resample_times=args.inpaint_resample,
            max_wave_batch=args.max_wave_batch,
            dpmpp_steps=args.dpmpp_steps, ddim_steps=args.ddim_steps,
            all_patches=True,
            wire=None if args.wire == "fp32" else args.wire,
            final_stage_batch=args.s3_batch,
        )
        dt = time.perf_counter() - t0
        metrics["levels"][f"mag2_{label}"] = {
            "patches": n2,
            "grid": args.mag2_grid,
            "wall_s": dt,
            "patches_per_sec": n2 / dt,
            "seconds_per_patch": dt / n2,
            "canvas": list(mag2.shape),
        }
        print(
            f"[wall] mag2 {label}: {dt:.1f} s ({n2} patches, "
            f"{n2 / dt:.3f} patches/s, {dt / n2:.3f} s/patch)",
            flush=True,
        )

    # sustained end-to-end vs the bench-derived device-only serving number
    details_path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH_DETAILS.json"
    )
    try:
        with open(details_path) as f:
            d = json.load(f)
        block = d.get("quant_serving_default", d)  # split-by-path layout
        derived = block.get("distilled_s3ddim4_serving_patches_per_sec")
    except OSError:
        derived = None
    if args.smoke:
        derived = None  # tiny cascade — comparison meaningless
    warm = metrics["levels"]["mag2_warm"]
    if derived:
        metrics["derived_device_only_patches_per_sec"] = derived
        metrics["e2e_overhead_factor"] = derived / warm["patches_per_sec"]

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)

    from kidney_diffusion_tpu.utils.logging import save_image

    save_image(mag0, os.path.join(args.out, "mag0.jpg"))
    save_image(mag1, os.path.join(args.out, "mag1.jpg"))
    save_image(mag2, os.path.join(args.out, "mag2_grid.jpg"))
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
