"""Full-slide-scale resident gigapixel run on the attached TPU chip.

The reference's centerpiece generates whole slides — mag-2 grids of
thousands of patches (/root/reference/sample_ultra_res.py:415-448). The
largest prior hardware run here was 11x11 = 121 patches
(artifacts/r4_gigapixel_wall*); two load-bearing claims were left as
extrapolations (round-4 verdict, Missing #3):

  * the small-wave amortization penalty (~13 s of the 97 s 11x11 wall)
    "a full-slide run amortizes away" -> warm throughput should rise;
  * device memory stays bounded across waves at full-slide scale via
    the `last_use` final-stage eviction + `stores[stage-1].clear()`
    (sample/gigapixel.py), and host RES stays flat (the background
    fetcher holds only in-flight buffers).

This tool MEASURES both on one mag-2 level at >=1000 patches through
the shipped serving configuration (stages 1/2 dpmpp-25 + stage-3
distilled-student ddim-4 on the w8a8-int8 + fp8-storage path), with a
per-(stage, wave) timing + memory trace via generate_patch_set's
metrics_hook, and writes the stitched 25600² canvas.

The conditioning canvas is synthetic (smooth tissue-toned noise at the
exact mag-1 geometry): `--all_patches` covers the non-tissue content,
and dense-compute timing is content-independent. Params are zeros from
eval_shape for the same reason (on-device init of ~1.3B params costs
minutes over the tunnel and changes nothing).

Run via nohup — NEVER under `timeout` (a killed TPU process backs up
the tunnel ~10 min):

    nohup /opt/venv/bin/python tools/gigapixel_fullscale.py \
        --out artifacts/r5_gigapixel_fullscale > /tmp/gfull.log 2>&1 &
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


def synthetic_canvas(width: int, seed: int = 0) -> np.ndarray:
    """Smooth tissue-toned mag-1 stand-in, fp32 [0,1] (width, width, 3).
    Low-frequency noise bilinearly upsampled, biased toward the H&E
    palette so tone-dependent paths see plausible values."""
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0.0, 1.0, size=(64, 64, 3)).astype(np.float32)
    ys = np.linspace(0, 63, width)
    y0 = np.floor(ys).astype(np.int64)
    y1 = np.minimum(y0 + 1, 63)
    wy = (ys - y0).astype(np.float32)
    rows = (
        coarse[y0] * (1 - wy)[:, None, None] + coarse[y1] * wy[:, None, None]
    )
    cols = (
        rows[:, y0] * (1 - wy)[None, :, None] + rows[:, y1] * wy[None, :, None]
    )
    base = np.asarray([0.83, 0.62, 0.74], np.float32)  # H&E-ish pink
    return np.clip(base + (cols - 0.5) * 0.3, 0.0, 1.0)


def device_bytes_in_use() -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", -1)) if stats else -1
    except Exception:
        return -1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="artifacts/r5_gigapixel_fullscale")
    p.add_argument("--version", type=str, default="v_param")
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--inpaint_resample", type=int, default=1)
    p.add_argument("--max_wave_batch", type=int, default=32)
    p.add_argument("--grid", type=int, default=33,
                   help="mag-2 patch grid side; 33 -> 1089 patches, the "
                        "full-slide class (reference slides run ~2800)")
    p.add_argument("--dpmpp_steps", type=int, nargs="+", default=[25, 25, 0])
    p.add_argument("--ddim_steps", type=int, nargs="+", default=[0, 0, 4])
    p.add_argument("--quant", type=str, default="int8")
    p.add_argument("--storage", type=str, default="float8_e4m3fn")
    p.add_argument("--runs", type=int, default=2,
                   help="run 1 = cold (compiles), run 2 = warm (the "
                        "sustained full-slide number)")
    p.add_argument("--assume_warm", action="store_true",
                   help="label the first run 'warm' (jit/XLA caches "
                        "already populated by a prior process — use for "
                        "a clean single-run warm measurement)")
    p.add_argument("--smoke", action="store_true",
                   help="CPU plumbing check: tiny cascade, tiny grid")
    args = p.parse_args()
    quant = None if args.quant == "none" else args.quant
    storage = None if args.storage == "none" else args.storage

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import (
        serving_overrides,
        tiny_test_cascade,
        ultra_res,
    )

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.grid = min(args.grid, 4)
        args.runs = 1
        args.dpmpp_steps, args.ddim_steps = [4, 0], [0, 2]
        cfg = tiny_test_cascade(cond_images_channels=3)
        mag_sizes = (320, 104, 32)
    else:
        from kidney_diffusion_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()
        from kidney_diffusion_tpu.data.wsi import MAG_LEVEL_SIZES

        cfg = serving_overrides(
            ultra_res(2, args.version), quant=quant, storage=storage
        )
        mag_sizes = MAG_LEVEL_SIZES

    from kidney_diffusion_tpu.data.wsi import inner_patch_width
    from kidney_diffusion_tpu.sample.gigapixel import generate_high_res_image
    from kidney_diffusion_tpu.utils.logging import host_rss_gb, save_image

    cascade = Cascade(cfg)
    params = zeros_params(cascade)
    patch_size = cascade.config.stages[-1].image_size

    # canvas width that yields EXACTLY an NxN grid at this geometry
    pw = inner_patch_width(2, patch_size=patch_size, mag_sizes=tuple(mag_sizes))
    pd = int(pw * (1 - args.overlap))
    width = pw + (args.grid - 1) * pd
    zoomed = synthetic_canvas(width)
    n_patches = args.grid ** 2
    print(
        f"[fullscale] canvas {width}² -> grid {args.grid}x{args.grid} "
        f"({n_patches} patches), output "
        f"{patch_size + (args.grid - 1) * int(patch_size * (1 - args.overlap))}²",
        flush=True,
    )

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
            "wire": "resident",
        },
        "grid": args.grid,
        "patches": n_patches,
        "canvas_px": width,
        "runs": {},
    }

    canvas = None
    for run in range(args.runs):
        label = "warm" if (run > 0 or args.assume_warm) else "cold"
        if run > 1 or (run == 1 and args.assume_warm):
            label = f"warm{run + 1}"
        trace: list = []
        t_run = time.perf_counter()
        last = {"t": t_run}

        def hook(**kw):
            now = time.perf_counter()
            trace.append(
                dict(
                    kw,
                    wall_s=round(now - last["t"], 3),
                    elapsed_s=round(now - t_run, 1),
                    rss_gb=round(host_rss_gb(), 2),
                    dev_bytes=device_bytes_in_use(),
                )
            )
            last["t"] = now

        key, sk = jax.random.split(key)
        canvas = generate_high_res_image(
            cascade, params, sk, zoomed, 2,
            overlap=args.overlap, mag_sizes=mag_sizes,
            inpaint_resample_times=args.inpaint_resample,
            max_wave_batch=args.max_wave_batch,
            dpmpp_steps=args.dpmpp_steps, ddim_steps=args.ddim_steps,
            all_patches=True, wire="resident",
            metrics_hook=hook,
        )
        dt = time.perf_counter() - t_run
        rss = [e["rss_gb"] for e in trace]
        dev = [e["dev_bytes"] for e in trace if e["dev_bytes"] > 0]
        s3 = [e for e in trace if e["stage"] == cascade.config.num_stages]
        metrics["runs"][label] = {
            "wall_s": round(dt, 1),
            "patches_per_sec": round(n_patches / dt, 4),
            "seconds_per_patch": round(dt / n_patches, 4),
            "rss_gb_min": min(rss),
            "rss_gb_max": max(rss),
            "dev_bytes_min": min(dev) if dev else -1,
            "dev_bytes_max": max(dev) if dev else -1,
            "store_entries_max": max(e["device_store_entries"] for e in trace),
            "stage3_wave_wall_s_first": s3[0]["wall_s"] if s3 else None,
            "stage3_wave_wall_s_median": (
                float(np.median([e["wall_s"] for e in s3])) if s3 else None
            ),
        }
        with open(os.path.join(args.out, f"trace_{label}.json"), "w") as f:
            json.dump(trace, f)
        print(
            f"[fullscale] {label}: {dt:.1f} s ({n_patches} patches, "
            f"{n_patches / dt:.3f} patches/s), RES {min(rss):.1f}-"
            f"{max(rss):.1f} GiB, device "
            f"{(min(dev) / 2**30 if dev else -1):.2f}-"
            f"{(max(dev) / 2**30 if dev else -1):.2f} GiB, "
            f"max live store entries "
            f"{metrics['runs'][label]['store_entries_max']}",
            flush=True,
        )

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    # full stitched canvas: 25600² JPEG (~ the reference's final slide jpg)
    save_image(canvas, os.path.join(args.out, "fullscale.jpg"))
    print(json.dumps({k: v for k, v in metrics.items() if k != "runs"} |
                     {"runs": metrics["runs"]}), flush=True)


if __name__ == "__main__":
    main()
