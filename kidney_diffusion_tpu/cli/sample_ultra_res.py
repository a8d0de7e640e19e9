"""Gigapixel WSI sampler CLI — the flagship entry point.

Equivalent of /root/reference/sample_ultra_res.py: generate a mag-0
whole-slide overview, then recursively refine mag-1 and mag-2 with the
batched-wavefront orchestrator (sample/gigapixel.py).

    python -m kidney_diffusion_tpu.cli.sample_ultra_res \
        --ckpt_mag0 ... --ckpt_mag1 ... --ckpt_mag2 ... \
        --overlap 0.25 --inpaint_resample 4 --version v_param

Checkpoints are per magnification level (one trainer checkpoint holds
all three stages of that level — vs the reference's 9 separate paths,
sample_ultra_res.py:474-482; per-stage partial checkpoints also load
thanks to shape-tolerant restore).
"""

from __future__ import annotations

import argparse
import os
from uuid import uuid4

import jax
import numpy as np

from ..cascade import Cascade
from ..data.wsi import AIRS_MAG_LEVEL_SIZES, MAG_LEVEL_SIZES
from ..models.configs import ultra_res
from ..sample.gigapixel import generate_high_res_image
from ..train import Trainer
from ..utils.logging import save_image


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_mag0", type=str, required=True)
    p.add_argument("--ckpt_mag1", type=str, required=True)
    p.add_argument("--ckpt_mag2", type=str, required=True)
    p.add_argument("--version", type=str, default="v1",
                   choices=("v1", "v2", "v_param", "airs"))
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--inpaint_resample", type=int, default=1)
    p.add_argument("--sample_dir", type=str, default="samples")
    p.add_argument("--ignore_unet_1", action="store_true")
    p.add_argument("--max_wave_batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--stop_at_mag", type=int, default=2)
    p.add_argument("--dpmpp_steps", type=int, nargs="+", default=0,
                   help="DPM-Solver++(2M) steps; one value for all stages or one per stage (0 disables; beats --ddim_steps per stage)")
    p.add_argument("--ddim_steps", type=int, nargs="+", default=0,
                   help="DDIM fast-path steps; one value for all stages or one per stage (0 disables — e.g. the validated serving mix: --dpmpp_steps 25 25 0 --ddim_steps 0 0 4)")
    p.add_argument("--wire", type=str, default="resident",
                   choices=["resident", "uint8", "fp32"],
                   help="host<->device transport: 'resident' keeps the "
                        "level on device (canvas uploaded once, strips "
                        "assembled on-chip, outputs fetched in the "
                        "background — the single-chip serving default); "
                        "'uint8' / 'fp32' stage conditioning on host")
    p.add_argument("--all_patches", action="store_true",
                   help="disable the mag-2 tissue filter and generate "
                        "the full patch grid (for non-histology content "
                        "or fresh-params runs where the HSV foreground "
                        "mask would drop everything)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="shard wave batches over this many devices "
                        "(default: all local devices)")
    p.add_argument("--quant", type=str, default="int8",
                   choices=("int8", "none"),
                   help="w8a8 int8 serving mode for the >=512 stages — ON "
                        "by default: 1.4x faster stage 3 from the same "
                        "checkpoints at matched FID (0.136 vs 0.158, "
                        "artifacts/r3_quant). --quant none = exact bf16.")
    p.add_argument("--activation_storage", type=str, default="float8_e4m3fn",
                   choices=("float8_e4m3fn", "float8_e5m2", "none"),
                   help="narrow activation storage for the >=512 stages "
                        "(default on; 'none' = bf16 storage)")
    args = p.parse_args()
    args.quant = None if args.quant == "none" else args.quant
    args.activation_storage = (
        None if args.activation_storage == "none" else args.activation_storage
    )
    return args


def load_level_params(ckpt: str, mag: int, version: str,
                      quant=None, storage=None):
    """`ckpt` may be one checkpoint holding all stages of the level, or a
    comma-separated list of per-stage checkpoints (each trained in its own
    run) — shape-tolerant loads merge them."""
    from ..models.configs import serving_overrides

    config = serving_overrides(
        ultra_res(mag, version), quant=quant, storage=storage
    )
    cascade = Cascade(config)
    trainer = Trainer(cascade)
    for path in ckpt.split(","):
        trainer.load(path.strip(), partial=True)
    params = [
        trainer.state(n).ema_params
        for n in range(1, config.num_stages + 1)
    ]
    return cascade, params


def main():
    args = parse_args()
    os.makedirs(args.sample_dir, exist_ok=True)
    sample_id = uuid4().hex[:8]
    postfix = "" if not args.version else "-" + args.version
    airs = args.version == "airs"
    mag_sizes = AIRS_MAG_LEVEL_SIZES if airs else MAG_LEVEL_SIZES

    seed = args.seed if args.seed is not None else np.random.randint(2**31)
    key = jax.random.PRNGKey(seed)

    # SPMD wave sharding — replaces the reference's one-process-per-GPU
    # worker pool (sample_ultra_res.py:213-249, --num_gpus)
    n_dev = args.num_devices or len(jax.devices())
    mesh = None
    if n_dev > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(data=n_dev, model=1, devices=jax.devices()[:n_dev])
        print(f"sharding wave batches over {n_dev} devices", flush=True)

    # mag 0: one full-cascade patch, unconditional
    cascade0, params0 = load_level_params(
        args.ckpt_mag0, 0, args.version, args.quant, args.activation_storage
    )
    key, sk = jax.random.split(key)
    mag0 = np.asarray(cascade0.sample(params0, sk, batch_size=1))[0]
    save_image(mag0, f"{args.sample_dir}/MAG0-{sample_id}{postfix}.jpg")
    print(f"MAG0 saved ({mag0.shape})", flush=True)
    del cascade0, params0
    if args.stop_at_mag < 1:
        return

    # mag 1: refine the overview
    cascade1, params1 = load_level_params(
        args.ckpt_mag1, 1, args.version, args.quant, args.activation_storage
    )
    key, sk = jax.random.split(key)
    mag1 = generate_high_res_image(
        cascade1, params1, sk, mag0.astype(np.float32), 1,
        overlap=args.overlap, mag_sizes=mag_sizes,
        center_cond=(args.version == "v2"), airs=airs,
        inpaint_resample_times=args.inpaint_resample,
        ignore_stage_1=args.ignore_unet_1,
        max_wave_batch=args.max_wave_batch,
        mesh=mesh,
        ddim_steps=args.ddim_steps,
        dpmpp_steps=args.dpmpp_steps,
        wire=None if args.wire == "fp32" else args.wire,
    )
    save_image(mag1, f"{args.sample_dir}/MAG1-{sample_id}{postfix}.jpg")
    print(f"MAG1 saved ({mag1.shape})", flush=True)
    del cascade1, params1
    if args.stop_at_mag < 2:
        return

    # mag 2: refine to native resolution (tissue-filtered patches)
    cascade2, params2 = load_level_params(
        args.ckpt_mag2, 2, args.version, args.quant, args.activation_storage
    )
    key, sk = jax.random.split(key)
    mag2 = generate_high_res_image(
        cascade2, params2, sk, mag1.astype(np.float32) / 255.0, 2,
        overlap=args.overlap, mag_sizes=mag_sizes,
        center_cond=(args.version == "v2"), airs=airs,
        inpaint_resample_times=args.inpaint_resample,
        ignore_stage_1=args.ignore_unet_1,
        max_wave_batch=args.max_wave_batch,
        mesh=mesh,
        ddim_steps=args.ddim_steps,
        dpmpp_steps=args.dpmpp_steps,
        all_patches=args.all_patches,
        wire=None if args.wire == "fp32" else args.wire,
    )
    save_image(mag2, f"{args.sample_dir}/MAG2-{sample_id}{postfix}.jpg")
    print(f"MAG2 saved ({mag2.shape})", flush=True)


if __name__ == "__main__":
    main()
