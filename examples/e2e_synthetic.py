"""End-to-end slice on synthetic data: train -> sample -> gigapixel.

Runs the whole framework vertically without any real WSI data:
  1. build synthetic "tissue" slides (pink blobs on background)
  2. train a small 2-stage cascade (16 -> 64) for a few hundred steps
  3. sample patches, then run the wavefront gigapixel orchestrator
     to refine a coarse image, and save the JPGs

    python examples/e2e_synthetic.py --steps 200 --out /tmp/e2e
    python examples/e2e_synthetic.py --steps 20 --cpu   # smoke mode
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_config():
    from kidney_diffusion_tpu.models.configs import StageConfig, CascadeConfig
    from kidney_diffusion_tpu.models.unet import UNetConfig

    def unet(lowres, mem_eff):
        return UNetConfig(
            dim=64,
            dim_mults=(1, 2, 4),
            num_resnet_blocks=2,
            layer_attns=(False, False, True),
            layer_cross_attns=False,
            memory_efficient=mem_eff,
            cond_images_channels=3,
            lowres_cond=lowres,
            dtype="bfloat16",
        )

    return CascadeConfig(
        name="e2e_synthetic",
        stages=(
            StageConfig(unet(False, False), 16, 64, "noise"),
            StageConfig(unet(True, True), 64, 64, "v"),
        ),
        condition_on_text=False,
    )


class SyntheticTissue:
    """Ultra-res-style dataset: (patch, zoomed-context) pairs from
    procedural pink-blob 'slides'."""

    def __init__(self, n=256, size=64, seed=0):
        self.n, self.size = n, size
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng((1234, i))
        img = np.full((self.size, self.size, 3), 0.95, np.float32)
        for _ in range(rng.integers(1, 4)):
            y, x = rng.integers(0, self.size - 16, 2)
            s = rng.integers(8, 24)
            color = np.array([0.85, 0.55, 0.65]) + rng.normal(0, 0.05, 3)
            img[y : y + s, x : x + s] = np.clip(color, 0, 1)
        zoomed = np.full_like(img, 0.95)
        c = self.size // 2
        zoomed[c - 8 : c + 8, c - 8 : c + 8] = img[::4, ::4].repeat(1, axis=0)[
            : 16, : 16
        ]
        return img, zoomed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--out", type=str, default="/tmp/e2e_synthetic")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.sample.gigapixel import generate_high_res_image
    from kidney_diffusion_tpu.train import Trainer
    from kidney_diffusion_tpu.utils.logging import save_image

    os.makedirs(args.out, exist_ok=True)
    cascade = Cascade(build_config())
    trainer = Trainer(cascade, lr=2e-4, max_grad_norm=1.0)
    ds = SyntheticTissue()
    trainer.add_train_dataset(
        ds, batch_size=16, keywords=("images", "cond_images"), num_workers=4
    )

    for stage in (1, 2):
        first = last = None
        for i in range(args.steps):
            loss = trainer.train_step(stage)
            first = loss if first is None else first
            last = loss
            if i % 50 == 0:
                print(f"stage{stage} step {i}: loss {loss:.4f}", flush=True)
        print(f"stage{stage}: loss {first:.4f} -> {last:.4f}", flush=True)

    ckpt = os.path.join(args.out, "ckpt")
    trainer.save(ckpt)
    print(f"checkpoint saved to {ckpt}")

    # direct cascade samples
    import jax.numpy as jnp

    cond = jnp.asarray(np.stack([ds[i][1] for i in range(4)]))
    params = [trainer.state(1).ema_params, trainer.state(2).ema_params]
    out = cascade.sample(
        params, jax.random.PRNGKey(0), batch_size=4, cond_images=cond
    )
    for i in range(4):
        save_image(np.asarray(out)[i], os.path.join(args.out, f"sample{i}.png"))

    # gigapixel refinement of a synthetic coarse image
    coarse = ds[0][0]
    canvas = generate_high_res_image(
        cascade, params, jax.random.PRNGKey(1), coarse, 1,
        overlap=0.25, mag_sizes=(256, 128, 64), inpaint_resample_times=2,
    )
    save_image(canvas, os.path.join(args.out, "gigapixel.jpg"))
    print(f"done; outputs in {args.out}")


if __name__ == "__main__":
    main()
