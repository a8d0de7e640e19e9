"""Patch-level trainer CLI (conditioned or unconditional).

Equivalent of /root/reference/train.py (metadata + 4-ch labelmap
conditioning, fp16 -> bf16 here) and /root/reference/train_uncond.py
(`--unconditional`, adds `--save_freq` unique checkpoints).

    python -m kidney_diffusion_tpu.cli.train_patch \
        --unet_number 1 --data_path /data/kidney [--unconditional]
"""

from __future__ import annotations

import argparse
import os

from ..cascade import Cascade
from ..data.patient import PatientDataset
from ..data.pipeline import train_valid_split
from ..models.configs import patch_conditioned, patch_unconditional
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

SPLIT_VALID_FRACTION = 0.025  # reference train.py:25


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--unet1_checkpoint", type=str, default="./ckpt_unet1")
    p.add_argument("--unet2_checkpoint", type=str, default="./ckpt_unet2")
    p.add_argument("--unet3_checkpoint", type=str, default="./ckpt_unet3")
    p.add_argument("--unet_number", type=int, choices=range(1, 4), required=True)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--sample_freq", type=int, default=500)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--annotated_dataset", action="store_true")
    p.add_argument("--unconditional", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--run_id", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--preview", type=int, default=0,
                   help="write N patch+labelmap overlay previews to "
                        "previews/ before training (headless equivalent "
                        "of train.py:165-172's matplotlib loop)")
    add_distributed_args(p)
    add_device_pool_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    mesh = setup_distributed(args)
    multihost = mesh is not None

    config = patch_unconditional() if args.unconditional else patch_conditioned()
    trainer = Trainer(
        Cascade(config),
        only_train_unet_number=args.unet_number,
        max_grad_norm=1.0,
        mesh=mesh,
    )

    slides, metadata, annotations = load_patient_environment(args.data_path)
    dataset = PatientDataset(
        slides,
        metadata,
        annotations=annotations,
        annotated_dataset=args.annotated_dataset,
        patch_size=1024,
        image_size=1024,
        unconditional=args.unconditional,
    )
    print(
        "Using ANNOTATED dataset for finetuning"
        if args.annotated_dataset
        else "Using UNANNOTATED dataset for initial training"
    )

    train_ds, valid_ds = train_valid_split(dataset, SPLIT_VALID_FRACTION)
    print(f"training with {len(train_ds)} samples, validating with {len(valid_ds)}")

    if args.preview > 0:
        from ..utils.logging import save_labelmap_preview

        os.makedirs("previews", exist_ok=True)
        for i in range(min(args.preview, len(train_ds))):
            item = train_ds[i]
            patch, labelmap = (item, None) if args.unconditional else (item[0], item[2])
            save_labelmap_preview(patch, f"previews/preview-{i}.png", labelmap)
        print(f"wrote {min(args.preview, len(train_ds))} previews to previews/")

    keywords = (
        ("images",) if args.unconditional else ("images", "text_embeds", "cond_images")
    )
    trainer.add_train_dataset(
        train_ds, batch_size=args.batch_size, num_workers=args.num_workers,
        keywords=keywords, shard_by_process=multihost, **device_pool_kwargs(args),
    )
    trainer.add_valid_dataset(
        valid_ds, batch_size=args.batch_size, num_workers=args.num_workers,
        keywords=keywords, shard_by_process=multihost, **device_pool_kwargs(args),
    )

    checkpoint = {
        1: args.unet1_checkpoint, 2: args.unet2_checkpoint, 3: args.unet3_checkpoint
    }[args.unet_number]

    run_training(
        trainer,
        unet_number=args.unet_number,
        checkpoint_path=checkpoint,
        sample_freq=args.sample_freq,
        save_freq=args.save_freq,
        sample_fn=default_sample_fn(dataset, args.unet_number),
        project="patch_uncond" if args.unconditional else "patch_cond",
        run_id=args.run_id,
        resume=args.resume,
        use_wandb=not args.no_wandb,
    )


if __name__ == "__main__":
    main()
