#!/usr/bin/env python
"""Progressive-distillation demo: train → distill 64→4 steps → FID A/B.

Runs the synthetic 2-stage cascade (the e2e config, with both stages on
the v objective — the well-conditioned parameterisation for few-step
students, arXiv:2202.00512 §4) through the full progressive-distillation
pipeline on the chip:

  python tools/distill_demo.py train   --out DIR --steps 3000
  python tools/distill_demo.py distill --out DIR --phase-steps 500
  python tools/distill_demo.py eval    --out DIR --patches 64

`train` produces the teacher (resumable, ckpt_teacher at the end).
`distill` runs halving phases N = 32, 16, 8, 4 per stage
(DistillTrainer.begin_phase: the phase teacher is the previous student's
EMA), writing ckpt_distill_n{N} after each phase.
`eval` computes relative FID (synthetic-weight InceptionV3, the
zero-egress operating point — valid for comparisons, not absolute
numbers) of the teacher's full 64-step ancestral samples vs the
distilled student at --student-steps (default 8 and 4) DDIM steps, plus
wall-clock seconds/image for each, into DIR/distill.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PHASES = (32, 16, 8, 4)


def _log(path, rec):
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _config():
    """e2e synthetic config with all-v objectives (distillation operates
    in x0/v space; an eps-param student is ill-conditioned at t≈1)."""
    from examples.e2e_synthetic import build_config

    cfg = build_config()
    stages = tuple(
        dataclasses.replace(st, pred_objective="v") for st in cfg.stages
    )
    return dataclasses.replace(cfg, name="e2e_synthetic_v", stages=stages)


def _build(distill=False, lr=2e-4):
    from examples.e2e_synthetic import SyntheticTissue
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.train import DistillTrainer, Trainer

    cascade = Cascade(_config())
    cls = DistillTrainer if distill else Trainer
    trainer = cls(cascade, lr=lr, max_grad_norm=1.0)
    ds = SyntheticTissue(n=224)
    trainer.add_train_dataset(
        ds, batch_size=16, keywords=("images", "cond_images"), num_workers=4
    )
    return cascade, trainer, ds


def cmd_train(args):
    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "train.jsonl")
    latest = os.path.join(args.out, "ckpt_latest")
    cascade, trainer, ds = _build()
    resumed = trainer.load(latest, noop_if_not_exist=True)
    start = {s: trainer.num_steps_taken(s) for s in (1, 2)}
    _log(log, {"event": "start", "resumed": bool(resumed), "steps": start})
    t0 = time.time()
    for stage in (1, 2):
        for step in range(start[stage], args.steps):
            loss = trainer.train_step(stage)
            if step % 50 == 0 or step == args.steps - 1:
                _log(log, {"stage": stage, "step": step + 1,
                           "loss": round(loss, 5), "t": round(time.time() - t0, 1)})
            if (step + 1) % args.ckpt_every == 0 or step + 1 == args.steps:
                trainer.save(latest)
    trainer.save(os.path.join(args.out, "ckpt_teacher"))
    _log(log, {"event": "teacher_saved", "wall_s": round(time.time() - t0, 1)})


def cmd_distill(args):
    log = os.path.join(args.out, "distill.jsonl")
    cascade, trainer, ds = _build(distill=True, lr=args.lr)
    # resume point: phase N's teacher is the previous phase's student
    src = (
        "ckpt_teacher"
        if args.start_phase >= PHASES[0]
        else f"ckpt_distill_n{args.start_phase * 2}"
    )
    ok = trainer.load(os.path.join(args.out, src))
    assert ok, f"missing {src} under {args.out} (run `train` first)"
    t0 = time.time()
    for n_steps in PHASES:
        if n_steps > args.start_phase:
            continue
        for stage in (1, 2):
            trainer.begin_phase(stage, n_steps)
        for i in range(args.phase_steps):
            l1 = trainer.distill_step(1)
            l2 = trainer.distill_step(2)
            if i % 50 == 0 or i == args.phase_steps - 1:
                _log(log, {"phase": n_steps, "step": i + 1,
                           "loss_s1": round(l1, 6), "loss_s2": round(l2, 6),
                           "t": round(time.time() - t0, 1)})
        trainer.save(os.path.join(args.out, f"ckpt_distill_n{n_steps}"))
        _log(log, {"event": "phase_done", "phase": n_steps,
                   "t": round(time.time() - t0, 1)})
    _log(log, {"event": "done", "wall_s": round(time.time() - t0, 1)})


def _sample_dir(cascade, params, out_dir, ds, n, batch, *, ddim_steps=0, seed=2000):
    import jax

    from kidney_diffusion_tpu.utils.logging import save_image

    os.makedirs(out_dir, exist_ok=True)
    # warm the jit cache for this (batch, ddim_steps) config so the
    # timed loop measures sampling, not compilation
    warm_b = min(batch, n)
    warm_cond = np.stack([ds[j][1] for j in range(warm_b)])
    np.asarray(cascade.sample(
        params, jax.random.PRNGKey(seed - 1), batch_size=warm_b,
        cond_images=warm_cond, ddim_steps=ddim_steps,
    ))
    i, t_total = 0, 0.0
    while i < n:
        b = min(batch, n - i)
        cond = np.stack([ds[j][1] for j in range(i, i + b)])
        t0 = time.time()
        out = np.asarray(
            cascade.sample(
                params, jax.random.PRNGKey(seed + i), batch_size=b,
                cond_images=cond, ddim_steps=ddim_steps,
            )
        )
        t_total += time.time() - t0
        for j in range(b):
            save_image(out[j], os.path.join(out_dir, f"{i + j:04d}.png"))
        i += b
    return t_total / n


def cmd_eval(args):
    from examples.e2e_synthetic import SyntheticTissue
    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.utils.logging import save_image
    from tools.sustained_train import _synthetic_inception_npz

    cascade, trainer, ds = _build()
    held = SyntheticTissue(n=224 + args.patches)
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    for i in range(args.patches):
        save_image(held[224 + i][0], os.path.join(real_dir, f"{i:04d}.png"))

    weights = args.inception_weights or _synthetic_inception_npz(
        os.path.join(args.out, "inception_synthetic.npz")
    )
    feature_fn = default_feature_fn(weights)

    result = {"patches": args.patches, "phases": list(PHASES)}

    def fid_of(tag, ckpt, ddim_steps):
        ok = trainer.load(os.path.join(args.out, ckpt))
        assert ok, f"missing {ckpt} under {args.out}"
        params = [trainer.state(1).ema_params, trainer.state(2).ema_params]
        sec = _sample_dir(
            cascade, params, os.path.join(args.out, f"fid_gen_{tag}"),
            held, args.patches, batch=16, ddim_steps=ddim_steps,
        )
        fid = float(calculate_fid_given_paths(
            (real_dir, os.path.join(args.out, f"fid_gen_{tag}")),
            feature_fn=feature_fn,
        ))
        result[f"fid_{tag}"] = fid
        result[f"sec_per_image_{tag}"] = round(sec, 4)
        print(f"{tag}: FID {fid:.3f}  {sec:.3f}s/img", flush=True)

    # teacher at the full 64-step ancestral sampler (the parity baseline)
    fid_of("teacher_64step", "ckpt_teacher", ddim_steps=0)
    for n_steps in args.student_steps:
        fid_of(f"student_{n_steps}step", f"ckpt_distill_n{n_steps}", ddim_steps=n_steps)
        # undistilled ablation: the TEACHER forced through the same
        # few-step DDIM grid — what distillation is buying
        fid_of(f"teacher_{n_steps}step_ddim", "ckpt_teacher", ddim_steps=n_steps)

    with open(os.path.join(args.out, "distill.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT:", json.dumps(result), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--out", required=True)
    tr.add_argument("--steps", type=int, default=3000)
    tr.add_argument("--ckpt-every", type=int, default=500)
    tr.add_argument("--cpu", action="store_true")
    di = sub.add_parser("distill")
    di.add_argument("--out", required=True)
    di.add_argument("--phase-steps", type=int, default=500)
    di.add_argument("--lr", type=float, default=1e-4)
    di.add_argument("--start-phase", type=int, default=PHASES[0],
                    help="resume from this phase downward (e.g. 16)")
    di.add_argument("--cpu", action="store_true")
    ev = sub.add_parser("eval")
    ev.add_argument("--out", required=True)
    ev.add_argument("--patches", type=int, default=64)
    ev.add_argument("--student-steps", type=int, nargs="+", default=[8, 4])
    ev.add_argument("--inception-weights", default=None)
    ev.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    {"train": cmd_train, "distill": cmd_distill, "eval": cmd_eval}[args.cmd](args)


if __name__ == "__main__":
    main()
