"""Ultra-res trainer CLI — one (magnification level, stage) per run.

Equivalent of /root/reference/train_ultra_res.py and its v2 / v_param /
airs variants (selected with --version, matching the reference's
dispatch in sample_ultra_res.py:37-44).

    python -m kidney_diffusion_tpu.cli.train_ultra_res \
        --magnification_level 1 --unet_number 2 --version v_param \
        --data_path /data/kidney
"""

from __future__ import annotations

import argparse

from ..cascade import Cascade
from ..data.pipeline import train_valid_split
from ..data.ultra_res import UltraResPatientDataset
from ..data.airs import AirsDataset
from ..models.configs import ultra_res
from ..train import Trainer
from .data_setup import load_patient_environment
from .train_loop import (
    add_device_pool_args,
    add_distributed_args,
    device_pool_kwargs,
    default_sample_fn,
    run_training,
    setup_distributed,
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="defaults to ./ckpt_mag{M}_unet{N}")
    p.add_argument("--magnification_level", type=int, choices=(0, 1, 2), required=True)
    p.add_argument("--unet_number", type=int, choices=(1, 2, 3), required=True)
    p.add_argument("--version", type=str, default="v1",
                   choices=("v1", "v2", "v_param", "airs"))
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--sample_freq", type=int, default=500)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--run_id", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--no_wandb", action="store_true")
    add_distributed_args(p)
    add_device_pool_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    mag = args.magnification_level
    mesh = setup_distributed(args)
    multihost = mesh is not None

    config = ultra_res(mag, args.version)
    trainer = Trainer(
        Cascade(config),
        only_train_unet_number=args.unet_number,
        # fp32-gradient clipping "to avoid nan" (train_ultra_res.py:112-114)
        max_grad_norm=1.0,
        mesh=mesh,
    )

    if args.version == "airs":
        dataset = AirsDataset(
            args.data_path, magnification_level=mag, center_cond=False, verbose=True
        )
    else:
        slides, metadata, _ = load_patient_environment(args.data_path)
        dataset = UltraResPatientDataset(
            slides, mag, metadata=metadata, center_cond=(args.version == "v2")
        )

    # dataloader keyword switch on mag (train_ultra_res.py:108)
    keywords = ("images",) if mag == 0 else ("images", "cond_images")
    # 90/10 held-out validation split (reference train_ultra_res.py:146-155)
    train_ds, valid_ds = train_valid_split(dataset, 0.1)
    trainer.add_train_dataset(
        train_ds, batch_size=args.batch_size, num_workers=args.num_workers,
        keywords=keywords, shard_by_process=multihost, **device_pool_kwargs(args),
    )
    trainer.add_valid_dataset(
        valid_ds, batch_size=args.batch_size, num_workers=args.num_workers,
        keywords=keywords, shard_by_process=multihost, **device_pool_kwargs(args),
    )

    checkpoint = args.checkpoint or f"./ckpt_mag{mag}_unet{args.unet_number}"
    run_training(
        trainer,
        unet_number=args.unet_number,
        checkpoint_path=checkpoint,
        sample_freq=args.sample_freq,
        save_freq=args.save_freq,
        sample_fn=default_sample_fn(dataset, args.unet_number),
        project=f"ultra_res_{args.version}_mag{mag}",
        run_id=args.run_id,
        resume=args.resume,
        use_wandb=not args.no_wandb,
    )


if __name__ == "__main__":
    main()
