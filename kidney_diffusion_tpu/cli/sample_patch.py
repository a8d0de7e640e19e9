"""Batched cascade patch sampler CLI (conditioned / unconditional / from
labelmaps).

Covers three reference scripts:
  * /root/reference/sample.py      — fixed metadata conds, zero labelmap,
    stage-at-a-time batches BATCH_SIZES=[128, 64, 6], --cond_scale CFG
  * /root/reference/sample_uncond.py — unconditional, [64, 64, 6]
  * /root/reference/sample_cond.py   — labelmaps from .npy files expanded
    to one-hot 4-channel, optional glom/tubules-only filter, 3 variants
    per mask (--from_labelmaps)

TPU-first: intermediate stage outputs stay on device between stages;
only the final PNGs cross to host (the reference round-trips every
stage through CPU, sample.py:63).
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from uuid import uuid4

import numpy as np
import jax

from ..cascade import Cascade
from ..models.configs import (
    patch_conditioned,
    patch_unconditional,
    serving_overrides,
)
from ..train import Trainer
from ..utils.logging import save_image

COND_BATCH_SIZES = (128, 64, 6)  # sample.py:19
UNCOND_BATCH_SIZES = (64, 64, 6)  # sample_uncond.py:19
DEFAULT_CONDS = (0.0, 0.5, 0.2)  # sample.py:43
NUM_LABEL_CHANNELS = 4


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True,
                   help="trainer checkpoint holding the stages to use")
    p.add_argument("--num_images", type=int, default=6)
    p.add_argument("--cond_scale", type=float, default=1.0)
    p.add_argument("--sample_dir", type=str, default="samples")
    p.add_argument("--unconditional", action="store_true")
    p.add_argument("--from_labelmaps", type=str, default=None,
                   help="directory of .npy labelmaps (sample_cond.py mode)")
    p.add_argument("--labelmap_filter", type=str, default=None,
                   choices=(None, "glom_tubules"),
                   help="zero all but glomeruli+tubuli channels")
    p.add_argument("--variants_per_mask", type=int, default=3)
    p.add_argument("--start_index", type=int, default=0,
                   help="first labelmap index to use (sample_cond.py:100)")
    p.add_argument("--end_index", type=int, default=None,
                   help="one-past-last labelmap index (sample_cond.py:101; "
                        "default: all maps from --start_index on)")
    p.add_argument("--stop_at_unet_number", type=int, default=None)
    p.add_argument("--ddim_eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = deterministic)")
    p.add_argument("--dpmpp_steps", type=int, nargs="+", default=0,
                   help="DPM-Solver++(2M) steps; one value for all stages or one per stage (0 disables; beats --ddim_steps per stage)")
    p.add_argument("--ddim_steps", type=int, nargs="+", default=0,
                   help="DDIM fast-path steps; one value for all stages or one per stage (0 disables — e.g. the validated serving mix: --dpmpp_steps 25 25 0 --ddim_steps 0 0 4)")
    p.add_argument("--quant", type=str, default=None, choices=("int8",),
                   help="w8a8 int8 serving mode for the >=512 stages "
                        "(same checkpoints, faster stage 3 — PERF.md)")
    p.add_argument("--activation_storage", type=str, default=None,
                   choices=("float8_e4m3fn", "float8_e5m2"),
                   help="narrow activation storage for the >=512 stages")
    return p.parse_args()


def load_labelmaps(
    directory: str,
    flt: str | None,
    start: int = 0,
    end: int | None = None,
) -> np.ndarray:
    """Integer .npy labelmaps -> one-hot 4-channel float
    (sample_cond.py:76-80). [start, end) selects a file range like the
    reference's --start_index/--end_index (sample_cond.py:73), over the
    SORTED listing (deterministic, unlike os.listdir order)."""
    paths = sorted(glob(os.path.join(directory, "*.npy")))[start:end]
    maps = []
    for path in paths:
        lm = np.load(path)
        onehot = np.stack(
            [(lm == c + 1).astype(np.float32) for c in range(NUM_LABEL_CHANNELS)],
            axis=-1,
        )
        if flt == "glom_tubules":
            onehot[..., 1] = 0  # vein/vessel
            onehot[..., 2] = 0  # artery
        maps.append(onehot)
    assert maps, f"no .npy labelmaps in {directory}"
    return np.stack(maps)


def main():
    args = parse_args()
    os.makedirs(args.sample_dir, exist_ok=True)

    config = serving_overrides(
        patch_unconditional() if args.unconditional else patch_conditioned(),
        quant=args.quant, storage=args.activation_storage,
    )
    cascade = Cascade(config)
    trainer = Trainer(cascade)
    trainer.load(args.checkpoint, partial=True)
    params = [
        trainer.state(n).ema_params if n in trainer._states else None
        for n in range(1, config.num_stages + 1)
    ]

    if args.from_labelmaps:
        labelmaps = load_labelmaps(
            args.from_labelmaps, args.labelmap_filter,
            args.start_index, args.end_index,
        )
        labelmaps = np.repeat(labelmaps, args.variants_per_mask, axis=0)
        n_total = labelmaps.shape[0]
    else:
        labelmaps = None
        n_total = args.num_images

    batch_sizes = UNCOND_BATCH_SIZES if args.unconditional else COND_BATCH_SIZES
    stop = args.stop_at_unet_number or config.num_stages

    kwargs = {}
    if not args.unconditional:
        kwargs["text_embeds"] = np.tile(
            np.asarray(DEFAULT_CONDS, np.float32)[None, None, :], (n_total, 1, 1)
        )
        if labelmaps is not None:
            kwargs["cond_images"] = labelmaps
        else:
            # zero labelmap (sample.py:55)
            kwargs["cond_images"] = np.zeros((n_total, 1024, 1024, 4), np.float32)

    key = jax.random.PRNGKey(np.random.randint(2**31))
    run_id = uuid4().hex[:8]
    # stage-at-a-time with the reference's per-stage batch sizes
    images = cascade.sample_stagewise(
        params,
        key,
        num_images=n_total,
        stage_batch_sizes=batch_sizes,
        cond_scale=args.cond_scale,
        stop_at_unet_number=stop,
        ddim_steps=args.ddim_steps,
        ddim_eta=args.ddim_eta,
        dpmpp_steps=args.dpmpp_steps,
        **kwargs,
    )
    for i in range(n_total):
        save_image(
            images[i],
            os.path.join(args.sample_dir, f"sample-{run_id}-{i}.png"),
        )
    print(f"{n_total}/{n_total} images generated", flush=True)


if __name__ == "__main__":
    main()
