"""Shared training loop for every train CLI.

Mirrors the reference's per-script `main()` loop shape
(/root/reference/train.py:206-246, train_ultra_res.py:187-251): an
infinite (or step-bounded) loop of train steps with

  * validation every `valid_every` steps (reference: 50, train.py:214)
  * checkpoint + EMA sample dump every `sample_freq` steps
  * optional unique-name checkpoints every `save_freq` steps
    (train_uncond.py:197-202)
  * cold-start resume via trainer.load(noop_if_not_exist=True)
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Optional

import numpy as np

from ..train import Trainer
from ..utils.logging import (
    MetricsLogger,
    ResWatchdog,
    generate_run_id,
    save_image,
)


def add_distributed_args(p) -> None:
    """--multihost flags shared by every train CLI. Replaces the
    reference's `accelerate launch` topology (train.py:124-128): one
    process per host, global-semantics jit across all."""
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed (one process per host)")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def add_device_pool_args(p) -> None:
    """--device_pool flags shared by every train CLI (the framework-owned
    fix for the tunnel-client RAM leak: per-step host->device uploads
    leak host RAM proportional to cumulative bytes on this backend —
    two multi-hour runs wedged at RES 82-104 GB in round 4)."""
    p.add_argument(
        "--device_pool", type=int, default=0,
        help="stage N batches on device once and cycle them (0 = upload "
             "a fresh batch every step; use >0 for runs beyond ~500 steps)")
    p.add_argument(
        "--pool_refresh", type=int, default=100,
        help="with --device_pool, re-stage one pool slot every N steps "
             "to keep walking the dataset (0 = fixed pool)")


def device_pool_kwargs(args) -> dict:
    return {
        "device_pool": getattr(args, "device_pool", 0),
        "pool_refresh_every": getattr(args, "pool_refresh", 0),
    }


def setup_distributed(args):
    """Initialise multi-host JAX when --multihost is given. Returns the
    global device mesh to train over (None when single-host); callers
    turn on per-process data sharding iff a mesh is returned."""
    if not getattr(args, "multihost", False):
        return None
    from ..parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    return make_mesh()


def run_training(
    trainer: Trainer,
    *,
    unet_number: int,
    checkpoint_path: str,
    sample_freq: int = 500,
    valid_every: int = 50,
    save_freq: Optional[int] = None,
    max_steps: Optional[int] = None,
    sample_fn: Optional[Callable[[Trainer, int, str], None]] = None,
    sample_dir: str = "samples",
    project: str = "training",
    run_id: Optional[str] = None,
    resume: bool = False,
    use_wandb: bool = True,
) -> None:
    trainer.load(checkpoint_path, noop_if_not_exist=True)

    run_id = run_id or generate_run_id()
    # multi-host: training steps, validation, sampling, and trainer.save
    # run on EVERY process (they are collective over the global mesh);
    # wandb/JSONL/PNG emission is main-process-only (the reference's
    # rank-0 gating, train.py:114-118)
    logger = MetricsLogger(
        f"{project}_unet{unet_number}", run_id=run_id, resume=resume,
        use_wandb=use_wandb, enabled=trainer.is_main,
    )
    out_dir = os.path.join(sample_dir, run_id)
    if trainer.is_main:
        os.makedirs(out_dir, exist_ok=True)
    trainer.print(f"Run ID: {run_id}")
    # tunnel-client RAM-leak early warning (round-4 wedge; see
    # utils/logging.ResWatchdog) — checked every 100 steps
    watchdog = ResWatchdog(print_fn=trainer.print)

    while True:
        step = trainer.num_steps_taken(unet_number)
        if max_steps is not None and step >= max_steps:
            trainer.save(checkpoint_path)
            trainer.print(f"reached {max_steps} steps; saved and stopping")
            return

        loss = trainer.train_step(unet_number)
        trainer.print(f"step {step}: unet{unet_number} loss: {loss:.5f}")
        logger.log(step, loss=loss)
        if step % 100 == 0:
            watchdog.check()

        if step and step % valid_every == 0:
            val_loss = trainer.valid_step(unet_number)
            trainer.print(f"step {step}: unet{unet_number} validation loss: {val_loss:.5f}")
            logger.log(step, val_loss=val_loss)

        if save_freq and step and step % save_freq == 0:
            unique = f"{os.path.splitext(checkpoint_path)[0]}-step{step}"
            trainer.save(unique)
            trainer.print(f"saved unique checkpoint {unique}")

        if step and step % sample_freq == 0:
            trainer.print("Saving model and sampling")
            if sample_fn is not None:
                try:
                    sample_fn(trainer, step, out_dir)
                    # Log this cadence's sample images (reference logs
                    # them to wandb, train.py:240-242).
                    for p in sorted(glob.glob(os.path.join(out_dir, f"*-{step}-*.png"))):
                        logger.log_image(step, os.path.basename(p), path=p)
                except Exception as e:  # sampling must never kill training
                    trainer.print(f"sampling failed: {e}")
            trainer.save(checkpoint_path)
            trainer.print("Finished sampling and saving model!")


def default_sample_fn(dataset, unet_number: int, *, batch_size: int = 2):
    """EMA samples conditioned on dataset items, saved as PNGs — the
    reference's periodic sample dump (train.py:226-242)."""

    def fn(trainer: Trainer, step: int, out_dir: str):
        # step-seeded pick: deterministic AND identical on every host —
        # sampling is collective over the global mesh, so conditioning
        # inputs must agree across processes
        rng = np.random.RandomState(step)
        items = [dataset[0], dataset[rng.randint(len(dataset))]][:batch_size]
        kwargs = {}
        first = items[0]
        if isinstance(first, tuple):
            images = np.stack([it[0] for it in items])
            if len(first) == 3:
                kwargs["text_embeds"] = np.stack([it[1] for it in items])
                kwargs["cond_images"] = np.stack([it[2] for it in items])
            else:
                kwargs["cond_images"] = np.stack([it[1] for it in items])
        else:
            images = np.stack(items)

        out = trainer.sample(
            batch_size=len(items),
            start_image=images,
            start_at_unet_number=unet_number,
            stop_at_unet_number=unet_number,
            **kwargs,
        )
        if trainer.is_main:  # sampling is collective; fetch + file IO is not
            out = np.asarray(out)
            for i in range(out.shape[0]):
                save_image(out[i], os.path.join(out_dir, f"sample-{step}-{i}.png"))

    return fn
