"""Kumar nuclei trainer CLI.

Equivalent of /root/reference/train_kumar.py: 2-stage 64->256 cascade
conditioned on a binary nuclei mask + (type, disease) metadata, finite
200k-step run, batch 16 with grad-accumulation chunks of 4
(train_kumar.py:134,147-148).
"""

from __future__ import annotations

import argparse

from ..cascade import Cascade
from ..data.kumar import KumarDataset
from ..data.pipeline import train_valid_split
from ..models.configs import kumar
from ..train import Trainer
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
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--unet_number", type=int, choices=(1, 2), required=True)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_batch_size", type=int, default=4,
                   help="grad-accum chunk size (train_kumar.py:148)")
    p.add_argument("--max_steps", type=int, default=200_000)
    p.add_argument("--sample_freq", type=int, default=500)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--run_id", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--preview", type=int, default=0,
                   help="write N patch+mask overlay previews to previews/ "
                        "before training (headless equivalent of "
                        "train_kumar.py:107-113's matplotlib loop)")
    add_distributed_args(p)
    add_device_pool_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    mesh = setup_distributed(args)
    multihost = mesh is not None
    chunks = max(args.batch_size // args.max_batch_size, 1)
    trainer = Trainer(
        Cascade(kumar()),
        only_train_unet_number=args.unet_number,
        grad_accum_chunks=chunks,
        mesh=mesh,
    )

    dataset = KumarDataset(args.data_path)
    keywords = ("images", "text_embeds", "cond_images")
    # 90/10 held-out validation split (reference train_kumar.py:125-135)
    train_ds, valid_ds = train_valid_split(dataset, 0.1)

    if args.preview > 0:
        import os

        from ..utils.logging import save_labelmap_preview

        os.makedirs("previews", exist_ok=True)
        for i in range(min(args.preview, len(train_ds))):
            patch, _, labelmap = train_ds[i]
            save_labelmap_preview(patch, f"previews/preview-{i}.png", labelmap)
        print(f"wrote {min(args.preview, len(train_ds))} previews to previews/")
    trainer.add_train_dataset(
        train_ds, batch_size=args.batch_size, num_workers=args.num_workers,
        keywords=keywords, shard_by_process=multihost, **device_pool_kwargs(args),
    )
    trainer.add_valid_dataset(
        valid_ds, batch_size=args.batch_size, num_workers=args.num_workers,
        keywords=keywords, shard_by_process=multihost, **device_pool_kwargs(args),
    )

    run_training(
        trainer,
        unet_number=args.unet_number,
        checkpoint_path=args.checkpoint or f"./ckpt_kumar_unet{args.unet_number}",
        sample_freq=args.sample_freq,
        max_steps=args.max_steps,
        sample_fn=default_sample_fn(dataset, args.unet_number),
        project="kumar",
        run_id=args.run_id,
        resume=args.resume,
        use_wandb=not args.no_wandb,
    )


if __name__ == "__main__":
    main()
