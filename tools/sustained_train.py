#!/usr/bin/env python
"""Sustained on-TPU training run with kill/resume + FID quality tracking.

VERDICT r2 #9 (demonstrated training at depth) and #6b (a recorded FID
number): runs the synthetic 2-stage cascade (the e2e config) for real
wall-clock on the chip, logging per-step losses to JSONL, checkpointing
on a cadence, surviving a mid-run SIGKILL, and — after training —
sampling from an early and a late checkpoint and computing FID against
a held-out synthetic set, asserting it improves with training. Mirrors
the reference's operating model: multi-day kill-and-resume training
(/root/reference/train.py:188) evaluated by FID
(/root/reference/evaluation.py:252-288).

Phases (run separately so a *real* kill can land between them):

  python tools/sustained_train.py train --out DIR --steps 2000 \
      [--ckpt-every 250] [--sample-every 500]   # resumes automatically
  python tools/sustained_train.py eval --out DIR --ckpt-a stepA --ckpt-b stepB

`train` appends to DIR/loss.jsonl and writes DIR/ckpt_latest plus
immutable DIR/ckpt_step{N} snapshots. Rerunning after a kill restores
ckpt_latest and continues from the persisted per-stage step counters —
the resume event (restored step > 0) is itself recorded in the JSONL.

`eval` samples PATCHES images from each checkpoint's EMA params, writes
them as PNGs, and computes FID vs held-out synthetic images using the
deterministic synthetic-weight InceptionV3 (tests/inception_ref) — the
zero-egress stand-in for the pretrained pool3 weights; swap in a
converted real checkpoint via --inception-weights when available
(tools/convert_fid_weights.py). Writes DIR/fid.json.
"""

import argparse
import dataclasses  # noqa: F401  (kept: config surgery in future variants)
import faulthandler
import json
import os
import signal
import sys
import time

# long-running harness: SIGUSR2 dumps all thread stacks without dying —
# the first diagnostic for a hung training run
faulthandler.register(signal.SIGUSR2, all_threads=True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _log(path, rec):
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _build(lr=2e-4):
    from examples.e2e_synthetic import SyntheticTissue, build_config
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.train import Trainer

    cascade = Cascade(build_config())
    trainer = Trainer(cascade, lr=lr, max_grad_norm=1.0)
    ds = SyntheticTissue(n=224)  # first 224 of the procedural stream
    trainer.add_train_dataset(
        ds, batch_size=16, keywords=("images", "cond_images"), num_workers=4
    )
    return cascade, trainer, ds


def cmd_train(args):
    os.makedirs(args.out, exist_ok=True)
    losses = os.path.join(args.out, "loss.jsonl")
    latest = os.path.join(args.out, "ckpt_latest")

    cascade, trainer, ds = _build()
    resumed = trainer.load(latest, noop_if_not_exist=True)
    start = {s: trainer.num_steps_taken(s) for s in (1, 2)}
    _log(losses, {
        "event": "start", "t": time.time(), "resumed": bool(resumed),
        "restored_steps": start,
    })
    if resumed:
        assert start[1] > 0 or start[2] > 0, (
            "resume restored a checkpoint but step counters are zero"
        )

    import jax

    t0 = time.time()
    for stage in (1, 2):
        for step in range(start[stage], args.steps):
            loss = trainer.train_step(stage)
            if step % 10 == 0 or step == args.steps - 1:
                _log(losses, {
                    "stage": stage, "step": step + 1, "loss": round(loss, 5),
                    "t": round(time.time() - t0, 1),
                })
            n = step + 1
            if n % args.ckpt_every == 0 or n == args.steps:
                trainer.save(latest)
                trainer.save(os.path.join(args.out, f"ckpt_step{n}"))
                _log(losses, {"event": "checkpoint", "stage": stage, "step": n})
            if args.sample_every and (n % args.sample_every == 0 or n == args.steps):
                from kidney_diffusion_tpu.utils.logging import save_image

                cond = np.stack([ds[i][1] for i in range(2)])
                out = cascade.sample(
                    [trainer.state(1).ema_params, trainer.state(2).ema_params],
                    jax.random.PRNGKey(n), batch_size=2, cond_images=cond,
                )
                save_image(
                    np.asarray(out)[0],
                    os.path.join(args.out, f"sample_s{stage}_n{n}.png"),
                )
                _log(losses, {"event": "sample", "stage": stage, "step": n})
    _log(losses, {"event": "done", "t": round(time.time() - t0, 1),
                  "wall_s": round(time.time() - t0, 1)})


def _synthetic_inception_npz(path):
    """Deterministic synthetic pool3 weights (the committed-fixture
    operating point) — a fixed feature embedding valid for RELATIVE FID
    comparisons; not comparable to published FID numbers."""
    from tests.inception_ref import flax_torch_shapes, synthetic_state_dict

    np.savez(path, **synthetic_state_dict(flax_torch_shapes()))
    return path


def _sample_to_dir(cascade, params, out_dir, ds, n, batch):
    import jax

    from kidney_diffusion_tpu.utils.logging import save_image

    os.makedirs(out_dir, exist_ok=True)
    i = 0
    while i < n:
        b = min(batch, n - i)
        cond = np.stack([ds[j][1] for j in range(i, i + b)])
        out = np.asarray(
            cascade.sample(
                params, jax.random.PRNGKey(1000 + i), batch_size=b,
                cond_images=cond,
            )
        )
        for j in range(b):
            save_image(out[j], os.path.join(out_dir, f"{i + j:04d}.png"))
        i += b
    return out_dir


def cmd_eval(args):
    from examples.e2e_synthetic import SyntheticTissue
    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.utils.logging import save_image

    cascade, trainer, ds = _build()

    # held-out real set: indices the training stream (n=224) never serves
    held = SyntheticTissue(n=224 + args.patches)
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    for i in range(args.patches):
        save_image(held[224 + i][0], os.path.join(real_dir, f"{i:04d}.png"))

    weights = args.inception_weights or _synthetic_inception_npz(
        os.path.join(args.out, "inception_synthetic.npz")
    )
    feature_fn = default_feature_fn(weights)

    result = {"patches": args.patches, "weights": os.path.basename(weights)}
    for tag, step in (("a", args.ckpt_a), ("b", args.ckpt_b)):
        ok = trainer.load(os.path.join(args.out, f"ckpt_step{step}"))
        assert ok, f"missing checkpoint ckpt_step{step} under {args.out}"
        params = [trainer.state(1).ema_params, trainer.state(2).ema_params]
        gen = _sample_to_dir(
            cascade, params, os.path.join(args.out, f"fid_gen_{step}"),
            held, args.patches, batch=16,
        )
        fid = calculate_fid_given_paths((real_dir, gen), feature_fn=feature_fn)
        result[f"fid_step{step}"] = float(fid)
        result[f"step_{tag}"] = step
        print(f"FID(step {step}) = {fid:.3f}", flush=True)

    result["improved"] = result[f"fid_step{args.ckpt_b}"] < result[
        f"fid_step{args.ckpt_a}"
    ]
    with open(os.path.join(args.out, "fid.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("FID:", json.dumps(result), flush=True)
    assert result["improved"], (
        f"FID did not improve: {result}"
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--out", required=True)
    tr.add_argument("--steps", type=int, default=2000)
    tr.add_argument("--ckpt-every", type=int, default=250)
    tr.add_argument("--sample-every", type=int, default=500)
    tr.add_argument("--cpu", action="store_true")
    ev = sub.add_parser("eval")
    ev.add_argument("--out", required=True)
    ev.add_argument("--ckpt-a", type=int, required=True)
    ev.add_argument("--ckpt-b", type=int, required=True)
    ev.add_argument("--patches", type=int, default=128)
    ev.add_argument("--inception-weights", default=None)
    ev.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        # the site hook pins JAX_PLATFORMS=axon; only a post-import
        # config update actually switches platforms (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    # resume after a kill re-pays compilation without the persistent
    # cache (same cache the CLIs enable, cli/__init__)
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    {"train": cmd_train, "eval": cmd_eval}[args.cmd](args)


if __name__ == "__main__":
    main()
