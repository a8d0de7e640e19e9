#!/usr/bin/env python
"""Fully-distilled cascade: every stage of `ultra_res(0, "v_param")`
served at few-step DDIM, with cascade-level FID evidence.

tools/distill_flagship.py distilled the 631M stage 3 against REAL
lowres conditioning. This harness completes the story at the CASCADE
level — the reference's actual serving shape (sample.py BATCH_SIZES:
every image passes stage 1 -> 2 -> 3):

  1. trains stages 1 (64², base) and 2 (256², sr) on-chip from the same
     synthetic-tissue distribution the flagship stage-3 teacher used,
  2. progressively distills both (halving phases, DistillTrainer),
  3. loads the stage-3 teacher + distilled student (EMA-only serving
     checkpoint from distill_flagship --save-student),
  4. generates full three-stage samples — stage-3 on the SHIPPED quant
     serving path — and scores cascade FID for
       * teacher at dpmpp-25/25/25 (fast-serving anchor),
       * teacher forced through few-step DDIM (undistilled ablation),
       * the distilled students at the same few steps.

  python tools/distill_cascade.py run --stage3-from FLAGSHIP_DIR \
      --student3 DISTILL_DIR/ckpt_student_ema_v2 --out DIR

Stage-1/2 training + distillation is minutes on-chip (the nets are
~40M params); the expensive 631M stage rides checkpoints produced by
the earlier harnesses.
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

from tools.distill_flagship import _log, _resolve_ckpt


def _build(lr, smoke=False):
    """Normal cascade for training + the quant SERVING cascade (shared
    params; stage 3 quantizes in-graph, stages 1/2 stay exact — the
    gigapixel CLI default)."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import serving_overrides, ultra_res
    from kidney_diffusion_tpu.train import DistillTrainer

    cfg = ultra_res(0, "v_param")
    if smoke:
        # same topology, toy dims/sizes so the CPU harness test traces
        # in seconds; every stage shrinks (unlike sustained_flagship's
        # smoke, which only exercises stage 3)
        sizes = (16, 32, 64)
        stages = []
        for i, st in enumerate(cfg.stages):
            u = dataclasses.replace(
                st.unet,
                dim=8,
                num_resnet_blocks=1 if i < 2 else (1, 1, 1, 1),
                spatial_chunks=(2 if st.unet.spatial_chunks else 0),
            )
            stages.append(
                dataclasses.replace(
                    st,
                    unet=u,
                    image_size=sizes[i],
                    timesteps=8,
                    random_crop_size=32 if st.random_crop_size else None,
                )
            )
        cfg = dataclasses.replace(cfg, stages=tuple(stages))
    cascade = Cascade(cfg)
    serving = Cascade(
        serving_overrides(cfg, quant="int8", storage="float8_e4m3fn")
    )
    trainer = DistillTrainer(
        cascade, lr=lr, max_grad_norm=1.0, teacher_dtype="bfloat16"
    )
    return cascade, serving, trainer


def _stage_kw(tag, steps, anchor):
    """Sampler options for (set, stage): the anchor set runs dpmpp at
    `anchor` steps; few-step sets run DDIM at the per-stage counts."""
    if tag == "teacher_dpmpp":
        return {"use_ddim": False, "ddim_steps": 0, "dpmpp_steps": anchor}
    return {"use_ddim": True, "ddim_steps": steps, "dpmpp_steps": 0}


def _sample_stage_sets(serving, n, params_by_set, inter, n_images, *,
                       eval_steps, anchor, key, log, batch=8):
    """Advance every eval set through stage `n` while its params are the
    only big tree resident. `inter` maps set tag -> host numpy of the
    previous stage's outputs (None for stage 1); returns the updated
    host-side intermediates and per-set stage wall seconds.

    The memory shape is the point: cascade stages are 0.3-8 GB of
    parameters but intermediates are megabytes, so the harness keeps ONE
    stage's params on device and ships images through the host — the
    reference's batched stagewise sampler (sample.py:19,37) under a
    16 GB chip budget."""
    import jax

    walls = {}
    b3 = 1 if n == 3 else batch
    # keys are PAIRED across sets (same init noise per image index, per
    # stage) — the same common-random-numbers protocol as
    # distill_flagship's eval, so set-vs-set FID deltas aren't noise-
    # driven. In --smoke this makes sets with identical params produce
    # identical images (expected).
    for tag, params in sorted(params_by_set.items()):
        kw = _stage_kw(tag, eval_steps[n - 1], anchor)
        outs = []
        t0 = time.time()
        for c0 in range(0, n_images, b3):
            b = min(b3, n_images - c0)
            kws = dict(kw)
            if n > 1:
                kws["lowres_image"] = inter[tag][c0:c0 + b]
            x = serving.sample_stage(
                params, n, jax.random.fold_in(jax.random.fold_in(key, n), c0),
                batch_size=b, **kws,
            )
            outs.append(np.asarray(x))
        walls[tag] = time.time() - t0
        inter[tag] = np.concatenate(outs, axis=0)
        _log(log, {"event": "stage_sampled", "stage": n, "set": tag,
                   "sec_per_patch": round(walls[tag] / max(n_images, 1), 3)})
    return inter, walls


def cmd_run(args):
    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "cascade_distill.jsonl")

    import jax

    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.train import Trainer
    from kidney_diffusion_tpu.utils.logging import save_image
    from tools.sustained_flagship import SyntheticTissue1024

    cascade, serving, tr = _build(args.lr, smoke=args.smoke)
    cfg = cascade.config
    size3 = cfg.stage(3).image_size

    # held-out reals: indices past the training range (same protocol as
    # distill_flagship / sustained_flagship)
    held = SyntheticTissue1024(n=96 + args.patches, size=size3)
    reals = [held[96 + i] for i in range(args.patches)]
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    for i, img in enumerate(reals):
        save_image(img, os.path.join(real_dir, f"{i:04d}.png"))

    # device-staged fp32 pool at the STAGE-2 size: stage-1/2 losses
    # resize down from it, stage 3 never trains here, and 256² batches
    # are 16x lighter than 1024² ones. Built by device-resizing the
    # full-res renders so the pool matches the distribution the stage-3
    # teacher saw as lowres conditioning (render-then-downsample, not
    # render-small).
    size2 = cfg.stage(2).image_size
    rng = np.random.default_rng(321)
    pool = []
    for _ in range(args.pool):
        idx = rng.integers(0, 95, args.batch)
        big = jax.device_put(
            np.stack([held[int(i)] for i in idx]).astype(np.float32))
        small = jax.image.resize(
            big, (args.batch, size2, size2, 3), "linear")
        float(small.mean())  # force completion so `big` can free
        pool.append({"images": small})
        del big
    _log(log, {"event": "staged", "pool_batches": len(pool),
               "pool_size": size2})

    result = {"patches": args.patches, "train_steps": args.train_steps,
              "phase_steps": args.phase_steps,
              "phases1": args.phases1, "phases2": args.phases2,
              "eval_steps": args.eval_steps,
              "model": "ultra_res(0, v_param) full cascade"}

    # ---- stage-wise: train -> distill -> advance eval sets -> drop ----
    # One stage's parameters on device at a time: stages 1/2 are 515M /
    # 283M params (8.2 / 4.5 GB of train state) — they do NOT fit
    # together with the eval EMAs on a 16 GB chip. Eval intermediates
    # (48 images at the stage's size) live on the host between stages.
    tags = ["teacher_dpmpp", "teacher_ddim_few"]
    if not args.skip_distill:
        tags.append("student_ddim_few")
    if args.serving_mix:
        # the SHIPPED serving point: stages 1/2 at the dpmpp anchor
        # steps (they are ~3% of cascade compute — distilling them buys
        # almost nothing, measured), stage 3 on the distilled ddim
        # student. Stages 1/2 reuse the teacher_dpmpp intermediates
        # (paired RNG makes them identical), so the set costs one extra
        # stage-3 pass + FID only.
        tags.append("serving_mix")
    inter = {t: None for t in tags}
    walls = {t: 0.0 for t in tags}
    key = jax.random.PRNGKey(7000)
    anchor = args.anchor_steps

    for n, phases in ((1, args.phases1), (2, args.phases2)):
        t0 = time.time()
        for i in range(args.train_steps):
            loss = tr.train_step(n, pool[i % len(pool)])
            if i % 200 == 0 or i == args.train_steps - 1:
                _log(log, {"stage": n, "step": i + 1, "loss": round(loss, 5),
                           "t": round(time.time() - t0, 1)})
        result[f"train{n}_wall_s"] = round(time.time() - t0, 1)

        # bf16 teacher-EMA snapshot (halves the bytes; the model casts
        # weights to bf16 inside apply anyway, so sampling is unchanged)
        teacher_n = jax.tree.map(
            lambda p: jax.numpy.asarray(p, jax.numpy.bfloat16),
            tr.state(n).ema_params,
        )
        params_by_set = {
            "teacher_dpmpp": teacher_n,
            "teacher_ddim_few": teacher_n,
        }
        if not args.skip_distill:
            t0 = time.time()
            for n_steps in phases:
                tr.begin_phase(n, n_steps)
                for i in range(args.phase_steps):
                    loss = tr.distill_step(n, pool[i % len(pool)])
                    if i % 100 == 0:
                        _log(log, {"stage": n, "phase": n_steps,
                                   "step": i + 1, "loss": round(loss, 6),
                                   "t": round(time.time() - t0, 1)})
                _log(log, {"event": "phase_done", "stage": n,
                           "phase": n_steps, "loss": round(loss, 6),
                           "t": round(time.time() - t0, 1)})
            result[f"distill{n}_wall_s"] = round(time.time() - t0, 1)

            if args.save_students:
                ts = time.time()
                tr.save(os.path.join(args.out, f"ckpt_student{n}_ema"),
                        ema_only=True)
                _log(log, {"event": "student_saved", "stage": n,
                           "save_s": round(time.time() - ts, 1)})
            params_by_set["student_ddim_few"] = tr.state(n).ema_params

        inter, w = _sample_stage_sets(
            serving, n, params_by_set, inter, args.patches,
            eval_steps=args.eval_steps, anchor=anchor, key=key, log=log,
        )
        for t, wt in w.items():
            walls[t] += wt
        if args.serving_mix:
            # identical params + paired RNG ⇒ identical intermediates
            inter["serving_mix"] = inter["teacher_dpmpp"]
            walls["serving_mix"] += w["teacher_dpmpp"]
        del teacher_n, params_by_set
        tr.drop_state(n)
        tr._teacher_params.pop(n, None)

    # pool is training-only; free it before the 631M stage arrives
    del pool

    # ---- stage 3: teacher checkpoint + distilled student --------------
    tr3 = Trainer(cascade, lr=args.lr, max_grad_norm=1.0)
    if args.smoke:
        # no flagship checkpoints on CPU: stage-3 "teacher" is a fresh
        # init and the "student" is the same weights — exercises every
        # code path; FID separations are only meaningful on-chip
        teacher3 = tr3.state(3).ema_params
        student3 = teacher3
    else:
        src = _resolve_ckpt(args.stage3_from)
        assert tr3.load(src, partial=False), src
        _log(log, {"event": "stage3_loaded", "from": src})
        # serving needs the EMA only: drop the 5 GB Adam state + raw
        # params so two 2.5 GB EMAs (teacher now, student later) fit
        st = tr3.state(3)
        tr3._states[3] = dataclasses.replace(st, params=(), opt_state=())
        del st
        teacher3 = tr3.state(3).ema_params
        student3 = None  # loaded after the teacher stage-3 passes

    inter, w = _sample_stage_sets(
        serving, 3,
        {"teacher_dpmpp": teacher3, "teacher_ddim_few": teacher3},
        inter, args.patches,
        eval_steps=args.eval_steps, anchor=anchor, key=key, log=log,
    )
    for t in ("teacher_dpmpp", "teacher_ddim_few"):
        walls[t] += w[t]

    # every remaining set runs stage 3 on the distilled student at
    # eval_steps[2] DDIM steps (serving_mix differs only in its
    # stage-1/2 lineage — the dpmpp anchor intermediates)
    student_tags = [t for t in tags if t in ("student_ddim_few", "serving_mix")]
    if student_tags:
        if not args.smoke:
            # replace the stage-3 EMA with the distilled student
            # (EMA-only serving checkpoint; partial restore merges over
            # the live state)
            del teacher3
            assert tr3.load(args.student3, partial=True)
            _log(log, {"event": "student3_loaded", "from": args.student3})
            student3 = tr3.state(3).ema_params
        inter, w = _sample_stage_sets(
            serving, 3, {t: student3 for t in student_tags}, inter,
            args.patches,
            eval_steps=args.eval_steps, anchor=anchor, key=key, log=log,
        )
        for t in student_tags:
            walls[t] += w[t]

    sets = []
    for tag in tags:
        out_dir = os.path.join(args.out, f"fid_gen_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(args.patches):
            save_image(inter[tag][i], os.path.join(out_dir, f"{i:04d}.png"))
        sec = walls[tag] / max(args.patches, 1)
        result[f"sec_per_patch_{tag}"] = round(sec, 3)
        _log(log, {"event": "sampled", "set": tag, "sec_per_patch": round(sec, 3)})
        sets.append(tag)

    weights = args.inception_weights
    if not weights:
        from tests.inception_ref import flax_torch_shapes, synthetic_state_dict

        weights = os.path.join(args.out, "inception_synthetic.npz")
        np.savez(weights, **synthetic_state_dict(flax_torch_shapes()))
    feature_fn = default_feature_fn(weights)
    for tag in sets:
        fid = float(calculate_fid_given_paths(
            (real_dir, os.path.join(args.out, f"fid_gen_{tag}")),
            feature_fn=feature_fn,
        ))
        result[f"fid_{tag}"] = fid
        print(f"{tag}: FID {fid:.4f}", flush=True)

    with open(os.path.join(args.out, "cascade_distill.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT:", json.dumps(result), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--stage3-from", default=None,
                   help="flagship run dir holding the stage-3 teacher ckpt")
    r.add_argument("--student3", default=None,
                   help="EMA-only distilled stage-3 serving checkpoint")
    r.add_argument("--out", required=True)
    r.add_argument("--train-steps", type=int, default=4000)
    r.add_argument("--phase-steps", type=int, default=300)
    r.add_argument("--phases1", type=int, nargs="+", default=[64, 32, 16, 8],
                   help="halving chain for stage 1 (1024 train timesteps)")
    r.add_argument("--phases2", type=int, nargs="+", default=[32, 16, 8],
                   help="halving chain for stage 2 (256 train timesteps)")
    r.add_argument("--eval-steps", type=int, nargs=3, default=[8, 8, 4],
                   help="per-stage few-step serving point (stage-3 student "
                        "was distilled to 4)")
    r.add_argument("--anchor-steps", type=int, default=25)
    r.add_argument("--batch", type=int, default=8)
    r.add_argument("--pool", type=int, default=16)
    r.add_argument("--lr", type=float, default=1e-4)
    r.add_argument("--patches", type=int, default=48)
    r.add_argument("--inception-weights", default=None)
    r.add_argument("--save-students", action="store_true",
                   help="write EMA-only serving checkpoints for the "
                        "distilled stage-1/2 students (ckpt_student{n}_ema)")
    r.add_argument("--serving-mix", action="store_true",
                   help="add the shipped serving point as a set: stages "
                        "1/2 at the dpmpp anchor steps, stage 3 on the "
                        "distilled student at eval_steps[2] DDIM steps")
    r.add_argument("--skip-distill", action="store_true",
                   help="teacher-only eval: skip stage-1/2 distillation "
                        "phases and the student_ddim_few set")
    r.add_argument("--cpu", action="store_true")
    r.add_argument("--smoke", action="store_true",
                   help="tiny same-topology config (CPU harness test)")
    args = ap.parse_args()
    if not args.smoke:
        assert args.stage3_from and args.student3, (
            "--stage3-from and --student3 are required outside --smoke"
        )
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cmd_run(args)


if __name__ == "__main__":
    main()
