#!/usr/bin/env python
"""Progressive distillation of the FLAGSHIP 631M stage-3 U-Net, on-chip.

Takes a trained `ultra_res(0, "v_param")` stage-3 checkpoint (from
tools/sustained_flagship.py), runs halving distillation phases
(DistillTrainer; default 64 -> 32 -> 16 -> 8 student steps — ONE
compiled step serves every phase, N rides the graph as a traced
scalar), and evaluates the serving win inline in the same process
(no 631M checkpoint round-trips): relative FID + seconds/patch of

  * teacher at dpmpp-25 (the shipped fast-serving baseline),
  * teacher forced through few-step DDIM (the undistilled ablation),
  * the distilled student at few-step DDIM.

  python tools/distill_flagship.py run --from FLAGSHIP_DIR --out DIR \
      [--phase-steps 300] [--patches 24] [--student-steps 8]

Teacher sample sets are generated BEFORE distillation (begin_phase
replaces the trainer's stage state), so one process never holds two
full 631M states. `--save-student` writes an EMA-params-only
checkpoint (~2.4 GB vs ~9 GB full state) for reuse.
"""

import argparse
import dataclasses
import faulthandler
import json
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR2, all_threads=True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _log(path, rec):
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _build(lr, smoke=False):
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import ultra_res
    from kidney_diffusion_tpu.train import DistillTrainer
    from tools.sustained_flagship import _build as _fb

    # reuse sustained_flagship's config surgery for --smoke parity;
    # bf16 teacher: student state + fp32 teacher would crowd 16 GB HBM
    cascade, _ = _fb(lr, smoke=smoke)
    trainer = DistillTrainer(
        cascade, lr=lr, max_grad_norm=1.0, teacher_dtype="bfloat16"
    )
    return cascade, trainer


def _resolve_ckpt(run_dir):
    from kidney_diffusion_tpu.utils.checkpoint import checkpoint_exists

    latest = os.path.join(run_dir, "ckpt_latest")
    if checkpoint_exists(latest):
        return latest
    snaps = sorted(
        (int(d[len("ckpt_step"):]), d)
        for d in os.listdir(run_dir) if d.startswith("ckpt_step")
    )
    assert snaps, f"no checkpoints under {run_dir}"
    return os.path.join(run_dir, snaps[-1][1])


def _prior_seconds(log_path):
    """sec_per_patch per set from a previous run's jsonl (resume)."""
    out = {}
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("event") == "sampled":
                    out[rec["set"]] = rec["sec_per_patch"]
    return out


def _sample_set(cascade, ema, reals, out_dir, *, sample_steps=0, ddim_steps=0,
                seed=3000, reuse=True):
    """Super-resolve each held-out lowres cond; returns sec/patch.

    With `reuse` (teacher sets — deterministic from the fixed
    checkpoint): if `out_dir` already holds one PNG per real (a prior
    run crashed after this set), the set is kept untouched and None is
    returned — the caller recovers the timing from the previous jsonl.
    Student sets pass `reuse=False` (a new training trajectory makes
    stale samples wrong) and any leftovers are deleted first.
    """
    import jax

    from kidney_diffusion_tpu.utils.logging import save_image

    os.makedirs(out_dir, exist_ok=True)
    stale = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    if reuse and len(stale) >= len(reals):
        return None
    for f in stale:
        os.remove(os.path.join(out_dir, f))
    stride = 4  # 1024 -> 256 lowres cond (smoke: 64 -> 16)
    # warm the jit cache so the timed loop measures sampling, not compile
    np.asarray(cascade.sample_stage(
        ema, 3, jax.random.PRNGKey(seed - 1), batch_size=1,
        lowres_image=reals[0][None, ::stride, ::stride],
        dpmpp_steps=sample_steps, use_ddim=ddim_steps > 0,
        ddim_steps=ddim_steps,
    ))
    t_total = 0.0
    for i, img in enumerate(reals):
        t0 = time.time()
        out = cascade.sample_stage(
            ema, 3, jax.random.PRNGKey(seed + i), batch_size=1,
            lowres_image=img[None, ::stride, ::stride],
            dpmpp_steps=sample_steps, use_ddim=ddim_steps > 0,
            ddim_steps=ddim_steps,
        )
        out = np.asarray(out)
        t_total += time.time() - t0
        save_image(out[0], os.path.join(out_dir, f"{i:04d}.png"))
    # first call carries the compile; report the amortized tail
    return t_total / max(len(reals), 1)


def cmd_run(args):
    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "distill.jsonl")

    import jax

    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.utils.logging import save_image
    from tools.sustained_flagship import SyntheticTissue1024

    cascade, trainer = _build(args.lr, smoke=args.smoke)
    size = cascade.config.stage(3).image_size
    src = _resolve_ckpt(getattr(args, "from"))
    ok = trainer.load(src, partial=False)
    assert ok, src
    _log(log, {"event": "loaded", "from": src,
               "step": trainer.num_steps_taken(3)})

    # held-out reals (training drew indices [0, 94]; probe was 95)
    held = SyntheticTissue1024(n=96 + args.patches, size=size)
    reals = [held[96 + i] for i in range(args.patches)]
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    for i, img in enumerate(reals):
        save_image(img, os.path.join(real_dir, f"{i:04d}.png"))

    result = {"patches": args.patches, "phases": args.phases,
              "phase_steps": args.phase_steps, "from": src,
              "model": "ultra_res(0, v_param) stage 3"}

    # ---- teacher sets FIRST (state is replaced by begin_phase) -------
    # ancestral-256 = the reference's own sampler (the matched-FID
    # anchor); dpmpp-25 = the shipped fast-serving baseline; ddim-N /
    # dpmpp-N = the undistilled few-step ablations the student must beat
    ema = trainer.state(3).ema_params
    sets = [("teacher_dpmpp25", dict(sample_steps=25))]
    if args.ancestral:
        sets.insert(0, ("teacher_ancestral", dict()))
    for n in args.student_steps:
        sets.append((f"teacher_ddim{n}", dict(ddim_steps=n)))
        sets.append((f"teacher_dpmpp{n}", dict(sample_steps=n)))
    all_tags = [t for t, _ in sets]
    prior = _prior_seconds(log)
    for tag, kw in sets:
        sec = _sample_set(
            cascade, ema, reals, os.path.join(args.out, f"fid_gen_{tag}"), **kw
        )
        if sec is None:  # reused from a crashed prior run
            result[f"sec_per_patch_{tag}"] = prior.get(tag)
            _log(log, {"event": "reused", "set": tag,
                       "sec_per_patch": prior.get(tag)})
            continue
        result[f"sec_per_patch_{tag}"] = round(sec, 3)
        _log(log, {"event": "sampled", "set": tag, "sec_per_patch": round(sec, 3)})
    ema = None  # drop the teacher-EMA handle: begin_phase must be able
    # to free the loaded state (631M params x {params,EMA,Adam} + a new
    # student state cannot coexist on a 16 GB chip)

    # ---- distillation phases ----------------------------------------
    # device-staged batch pool (uploading 50 MB/step costs seconds over
    # the axon tunnel — same trick as sustained_flagship)
    rng = np.random.default_rng(123)
    pool = []
    for _ in range(args.pool):
        idx = rng.integers(0, 95, args.batch)
        # fp16 on device (the distill step casts back to fp32 in-graph):
        # halves pool HBM; quantization ~5e-4 on [0,1] images, below the
        # 8-bit granularity the pipeline already assumes
        pool.append({"images": jax.device_put(
            np.stack([held[int(i)] for i in idx]).astype(np.float16))})
    _log(log, {"event": "staged", "pool_batches": len(pool)})

    t0 = time.time()
    for n_steps in args.phases:
        trainer.begin_phase(3, n_steps)
        for i in range(args.phase_steps):
            loss = trainer.distill_step(3, pool[i % len(pool)])
            if i % 20 == 0 or i == args.phase_steps - 1:
                _log(log, {"phase": n_steps, "step": i + 1,
                           "loss": round(loss, 6),
                           "t": round(time.time() - t0, 1)})
        _log(log, {"event": "phase_done", "phase": n_steps,
                   "t": round(time.time() - t0, 1)})
        if n_steps in args.student_steps:
            # sample this student NOW — the next phase replaces the state
            ema = trainer.state(3).ema_params
            tag = f"student_ddim{n_steps}"
            sec = _sample_set(
                cascade, ema, reals, os.path.join(args.out, f"fid_gen_{tag}"),
                ddim_steps=n_steps, reuse=False,
            )
            ema = None  # release before the next begin_phase
            result[f"sec_per_patch_{tag}"] = round(sec, 3)
            all_tags.append(tag)
            _log(log, {"event": "sampled", "set": tag,
                       "sec_per_patch": round(sec, 3)})
    result["distill_wall_s"] = round(time.time() - t0, 1)

    if args.save_student:
        # Trainer-format serving checkpoint: the sampling CLIs restore it
        # with partial=True, merged after the full teacher checkpoint
        # (--ckpt_mag2 "teacher,student" overrides stage 3's EMA)
        ts = time.time()
        trainer.save(os.path.join(args.out, "ckpt_student_ema"), ema_only=True)
        _log(log, {"event": "student_saved", "save_s": round(time.time() - ts, 1)})

    # ---- FID ---------------------------------------------------------
    weights = args.inception_weights
    if not weights:
        from tests.inception_ref import flax_torch_shapes, synthetic_state_dict

        weights = os.path.join(args.out, "inception_synthetic.npz")
        np.savez(weights, **synthetic_state_dict(flax_torch_shapes()))
    feature_fn = default_feature_fn(weights)
    for tag in all_tags:
        fid = float(calculate_fid_given_paths(
            (real_dir, os.path.join(args.out, f"fid_gen_{tag}")),
            feature_fn=feature_fn,
        ))
        result[f"fid_{tag}"] = fid
        print(f"{tag}: FID {fid:.4f}", flush=True)

    with open(os.path.join(args.out, "distill.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT:", json.dumps(result), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--from", dest="from", required=True,
                   help="sustained_flagship run dir holding the teacher ckpt")
    r.add_argument("--out", required=True)
    r.add_argument("--phases", type=int, nargs="+", default=[64, 32, 16, 8])
    r.add_argument("--phase-steps", type=int, default=300)
    r.add_argument("--batch", type=int, default=4)
    r.add_argument("--pool", type=int, default=24)
    r.add_argument("--lr", type=float, default=5e-5)
    r.add_argument("--patches", type=int, default=24)
    r.add_argument("--student-steps", type=int, nargs="+", default=[8])
    r.add_argument("--ancestral", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="include the ancestral-256 teacher set (the "
                        "reference-sampler matched-FID anchor)")
    r.add_argument("--save-student", action="store_true")
    r.add_argument("--inception-weights", default=None)
    r.add_argument("--cpu", action="store_true")
    r.add_argument("--smoke", action="store_true",
                   help="tiny same-topology config (CPU harness test)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cmd_run(args)


if __name__ == "__main__":
    main()
