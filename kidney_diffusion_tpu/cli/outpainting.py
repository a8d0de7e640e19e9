"""Outpainting CLI: unconditional gigapixel-style grid generation.

Equivalent of /root/reference/outpainting.py: a full N×N patch grid with
wavefront ordering and overlap-inpaint seams, no coarse conditioning,
stitched onto a zero canvas.
"""

from __future__ import annotations

import argparse
import os
from uuid import uuid4

import jax
import numpy as np

from ..cascade import Cascade
from ..models.configs import patch_unconditional, serving_overrides
from ..sample.outpaint import generate_outpainted_image
from ..train import Trainer
from ..utils.logging import save_image


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_patches_width", type=int, default=4)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--inpaint_resample", type=int, default=1)
    p.add_argument("--sample_dir", type=str, default="samples")
    p.add_argument("--max_wave_batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--ddim_steps", type=int, nargs="+", default=0,
                   help="DDIM fast-path steps; one value for all stages or one per stage (0 disables — e.g. the validated serving mix: --dpmpp_steps 25 25 0 --ddim_steps 0 0 4)")
    p.add_argument("--dpmpp_steps", type=int, nargs="+", default=0,
                   help="DPM-Solver++(2M) steps; one value for all stages or one per stage (0 disables; beats --ddim_steps per stage)")
    p.add_argument("--wire", type=str, default="resident",
                   choices=["resident", "uint8", "fp32"],
                   help="host<->device transport (see sample_ultra_res)")
    p.add_argument("--quant", type=str, default="int8",
                   choices=("int8", "none"),
                   help="w8a8 int8 serving mode for the >=512 stages — ON "
                        "by default (matched FID, artifacts/r3_quant); "
                        "'none' = exact bf16")
    p.add_argument("--activation_storage", type=str, default="float8_e4m3fn",
                   choices=("float8_e4m3fn", "float8_e5m2", "none"),
                   help="narrow activation storage (default on)")
    args = p.parse_args()
    args.quant = None if args.quant == "none" else args.quant
    args.activation_storage = (
        None if args.activation_storage == "none" else args.activation_storage
    )
    return args


def main():
    args = parse_args()
    os.makedirs(args.sample_dir, exist_ok=True)

    config = serving_overrides(
        patch_unconditional(),
        quant=args.quant, storage=args.activation_storage,
    )
    cascade = Cascade(config)
    trainer = Trainer(cascade)
    trainer.load(args.checkpoint, partial=True)
    params = [trainer.state(n).ema_params for n in range(1, config.num_stages + 1)]

    seed = args.seed if args.seed is not None else np.random.randint(2**31)
    canvas = generate_outpainted_image(
        cascade, params, jax.random.PRNGKey(seed),
        num_patches_width=args.num_patches_width,
        overlap=args.overlap,
        inpaint_resample_times=args.inpaint_resample,
        max_wave_batch=args.max_wave_batch,
        ddim_steps=args.ddim_steps,
        dpmpp_steps=args.dpmpp_steps,
        wire=None if args.wire == "fp32" else args.wire,
    )
    out = f"{args.sample_dir}/OUTPAINT-{uuid4().hex[:8]}.jpg"
    save_image(canvas, out)
    print(f"saved {out} ({canvas.shape})")


if __name__ == "__main__":
    main()
