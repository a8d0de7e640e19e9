"""Demo / inspection gigapixel sampler.

Equivalent of /root/reference/sample_ultra_res_demo.py: a mag-1
refinement limited to a handful of patches (the reference caps at a 2x2
grid, sample_ultra_res_demo.py:117) that dumps EVERY intermediate
artifact — per-patch cond images, inpaint strips and masks, per-stage
outputs — for eyeballing the seam-blending machinery, optionally looping
several full generations (sample_ultra_res_demo.py:410-413).
"""

from __future__ import annotations

import argparse
import os
from uuid import uuid4

import jax
import numpy as np

from ..data.wsi import AIRS_MAG_LEVEL_SIZES, MAG_LEVEL_SIZES
from ..sample.gigapixel import generate_high_res_image
from ..utils.logging import save_image
from .sample_ultra_res import load_level_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_mag0", type=str, required=True)
    p.add_argument("--ckpt_mag1", type=str, required=True)
    p.add_argument("--version", type=str, default="v1",
                   choices=("v1", "v2", "v_param", "airs"))
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--inpaint_resample", type=int, default=1)
    p.add_argument("--sample_dir", type=str, default="samples_demo")
    p.add_argument("--max_patches", type=int, default=4)
    p.add_argument("--loops", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quant", type=str, default="int8",
                   choices=("int8", "none"))
    p.add_argument("--activation_storage", type=str, default="float8_e4m3fn",
                   choices=("float8_e4m3fn", "float8_e5m2", "none"))
    args = p.parse_args()
    args.quant = None if args.quant == "none" else args.quant
    args.activation_storage = (
        None if args.activation_storage == "none" else args.activation_storage
    )

    os.makedirs(args.sample_dir, exist_ok=True)
    airs = args.version == "airs"
    mag_sizes = AIRS_MAG_LEVEL_SIZES if airs else MAG_LEVEL_SIZES
    key = jax.random.PRNGKey(args.seed)

    cascade0, params0 = load_level_params(
        args.ckpt_mag0, 0, args.version, args.quant, args.activation_storage
    )
    cascade1, params1 = load_level_params(
        args.ckpt_mag1, 1, args.version, args.quant, args.activation_storage
    )

    for loop in range(args.loops):
        run_id = uuid4().hex[:8]
        run_dir = os.path.join(args.sample_dir, run_id)
        os.makedirs(run_dir, exist_ok=True)

        key, k0, k1 = jax.random.split(key, 3)
        mag0 = np.asarray(cascade0.sample(params0, k0, batch_size=1))[0]
        save_image(mag0, f"{run_dir}/MAG0.jpg")

        mag1 = generate_high_res_image(
            cascade1, params1, k1, mag0.astype(np.float32), 1,
            overlap=args.overlap, mag_sizes=mag_sizes,
            center_cond=(args.version == "v2"), airs=airs,
            inpaint_resample_times=args.inpaint_resample,
            max_patches=args.max_patches,
            debug_dir=os.path.join(run_dir, "artifacts"),
        )
        save_image(mag1, f"{run_dir}/MAG1.jpg")
        print(f"[demo] loop {loop + 1}/{args.loops}: artifacts in {run_dir}/", flush=True)


if __name__ == "__main__":
    main()
