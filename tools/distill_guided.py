#!/usr/bin/env python
"""Guidance distillation demo: fold classifier-free guidance into an
UNGUIDED few-step student, with on-chip FID + class-fidelity evidence.

The reference serves conditioned models through imagen-pytorch's
doubled-batch CFG (cond_scale > 1 runs the U-Net twice per step). The
distillation pipeline here can fold that guidance into the student
(`DistillTrainer(teacher_cond_scale=s)`: the teacher inside the distill
loss is the guided combination, cascade.py:266-280), so the served
student needs ONE unguided pass per step — a 2x model-eval saving on
top of the progressive step reduction. Until this harness that path was
only trace-tested; this runs it end-to-end:

  1. train a text-conditioned single-stage toy (two tissue classes,
     one-hot (b, 1, 2) embeds, cond_drop_prob 0.1) on-chip,
  2. fold guidance at the teacher's own step count (phase 64 with
     teacher_cond_scale), then progressively halve UNGUIDED (32..4),
  3. score four paired sets against held-out reals: guided teacher at
     dpmpp-25 (anchor), UNguided teacher at dpmpp-25 (shows guidance
     matters), guided teacher at ddim-4 (undistilled ablation), and the
     distilled student UNGUIDED at ddim-4,
  4. report FID plus a class-fidelity probe (blob-hue classifier:
     class 0 is pink, R > B; class 1 is blue, B > R).

  python tools/distill_guided.py run --out DIR
  python tools/distill_guided.py run --out DIR --smoke --cpu   # CI
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

from tools.distill_flagship import _log


def _config(smoke=False):
    from kidney_diffusion_tpu.models.configs import CascadeConfig, StageConfig
    from kidney_diffusion_tpu.models.unet import UNetConfig

    if smoke:
        unet = UNetConfig(
            dim=8, dim_mults=(1, 2), cond_dim=8, text_embed_dim=2,
            num_resnet_blocks=1, layer_attns=(False, True),
            layer_cross_attns=(False, True), attn_heads=2, attn_dim_head=8,
            dtype="float32",
        )
        stage = StageConfig(unet, 16, 8, "v")
    else:
        unet = UNetConfig(
            dim=64, dim_mults=(1, 2, 4), cond_dim=64, text_embed_dim=2,
            num_resnet_blocks=2, layer_attns=(False, False, True),
            layer_cross_attns=(False, False, True), dtype="bfloat16",
        )
        # v objective: the well-conditioned parameterisation for few-step
        # students (PERF.md round 3: eps students distill in eps space)
        stage = StageConfig(unet, 64, 64, "v")
    return CascadeConfig(
        name="guided_toy", stages=(stage,), condition_on_text=True,
        cond_drop_prob=0.1,
    )


class TwoClassTissue:
    """Class 0: pink blobs (R > B). Class 1: blue blobs (B > R)."""

    COLORS = (
        np.array([0.85, 0.55, 0.65]),  # pink
        np.array([0.55, 0.65, 0.85]),  # blue
    )

    def __init__(self, size):
        self.size = size

    def __getitem__(self, i):
        rng = np.random.default_rng((4321, i))
        cls = i % 2
        img = np.full((self.size, self.size, 3), 0.95, np.float32)
        lo = max(self.size - 16, 1)
        for _ in range(rng.integers(1, 4)):
            y, x = rng.integers(0, lo, 2)
            s = int(rng.integers(self.size // 8, self.size // 3 + 1))
            color = self.COLORS[cls] + rng.normal(0, 0.05, 3)
            img[y:y + s, x:x + s] = np.clip(color, 0, 1)
        return img, cls


def _embeds(classes):
    e = np.zeros((len(classes), 1, 2), np.float32)
    e[np.arange(len(classes)), 0, np.asarray(classes)] = 1.0
    return e


def class_accuracy(images, classes):
    """Blob-hue probe: mean (R - B) over non-background pixels decides
    the class; background (0.95 grey) contributes ~0 either way."""
    imgs = np.asarray(images, np.float32)
    rb = imgs[..., 0] - imgs[..., 2]
    pred = (rb.reshape(rb.shape[0], -1).mean(axis=1) < 0).astype(int)
    return float((pred == np.asarray(classes)).mean())


def cmd_run(args):
    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "guided_distill.jsonl")

    import jax

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.train import DistillTrainer
    from kidney_diffusion_tpu.utils.logging import save_image

    cfg = _config(smoke=args.smoke)
    size = cfg.stage(1).image_size
    cascade = Cascade(cfg)
    tr = DistillTrainer(
        cascade, lr=args.lr, max_grad_norm=1.0,
        teacher_cond_scale=args.cond_scale,
    )

    data = TwoClassTissue(size)
    # train pool: indices 0..N-1; held-out reals start past them
    rng = np.random.default_rng(99)
    pool = []
    for _ in range(args.pool):
        idx = rng.integers(0, 4096, args.batch)
        imgs, classes = zip(*(data[int(i)] for i in idx))
        pool.append({
            "images": jax.device_put(np.stack(imgs)),
            "text_embeds": jax.device_put(_embeds(classes)),
        })
    _log(log, {"event": "staged", "pool_batches": len(pool)})

    t0 = time.time()
    for i in range(args.train_steps):
        loss = tr.train_step(1, pool[i % len(pool)])
        if i % 200 == 0 or i == args.train_steps - 1:
            _log(log, {"step": i + 1, "loss": round(loss, 5),
                       "t": round(time.time() - t0, 1)})
    result = {"train_wall_s": round(time.time() - t0, 1),
              "cond_scale": args.cond_scale,
              "train_steps": args.train_steps,
              "phases": list(args.phases),
              "phase_steps": args.phase_steps}

    teacher = jax.tree.map(lambda p: np.asarray(p), tr.state(1).ema_params)

    t0 = time.time()
    for k, n_steps in enumerate(args.phases):
        # guidance folds into the student in the FIRST phase only
        # (arXiv:2210.03142); later phases distill the already-guided
        # student unguided — re-applying the scale would compound it
        # geometrically (w, w², ... — measured: FID 103.7 vs anchor 0.52)
        scale = args.cond_scale if k == 0 else 1.0
        tr.begin_phase(1, n_steps, teacher_cond_scale=scale)
        for i in range(args.phase_steps):
            loss = tr.distill_step(1, pool[i % len(pool)])
        _log(log, {"event": "phase_done", "phase": n_steps, "scale": scale,
                   "loss": round(loss, 6), "t": round(time.time() - t0, 1)})
    result["distill_wall_s"] = round(time.time() - t0, 1)
    student = tr.state(1).ema_params

    # ---- paired eval sets -------------------------------------------------
    n = args.patches
    classes = [i % 2 for i in range(n)]
    reals = [data[10_000 + i][0] for i in range(n)]  # held-out, same mix
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    for i, img in enumerate(reals):
        save_image(img, os.path.join(real_dir, f"{i:04d}.png"))

    few = args.student_steps
    sets = {
        "teacher_guided_dpmpp": (teacher, args.cond_scale,
                                 {"dpmpp_steps": args.anchor_steps}),
        "teacher_unguided_dpmpp": (teacher, 1.0,
                                   {"dpmpp_steps": args.anchor_steps}),
        "teacher_guided_ddim_few": (teacher, args.cond_scale,
                                    {"use_ddim": True, "ddim_steps": few}),
        "student_unguided_ddim_few": (student, 1.0,
                                      {"use_ddim": True, "ddim_steps": few}),
    }
    key = jax.random.PRNGKey(8000)
    b = args.batch
    for tag, (params, scale, kw) in sorted(sets.items()):
        outs = []
        t0 = time.time()
        for c0 in range(0, n, b):
            nb = min(b, n - c0)
            x = cascade.sample_stage(
                params, 1, jax.random.fold_in(key, c0), batch_size=nb,
                text_embeds=_embeds(classes[c0:c0 + nb]),
                cond_scale=scale, **kw,
            )
            outs.append(np.asarray(x))
        wall = time.time() - t0
        imgs = np.concatenate(outs, axis=0)
        out_dir = os.path.join(args.out, f"fid_gen_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(n):
            save_image(imgs[i], os.path.join(out_dir, f"{i:04d}.png"))
        acc = class_accuracy(imgs, classes)
        result[f"sec_per_img_{tag}"] = round(wall / max(n, 1), 4)
        result[f"class_acc_{tag}"] = acc
        _log(log, {"event": "sampled", "set": tag,
                   "sec_per_img": round(wall / max(n, 1), 4),
                   "class_acc": acc})

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
        print(f"{tag}: FID {fid:.4f} acc {result[f'class_acc_{tag}']:.3f}",
              flush=True)

    with open(os.path.join(args.out, "guided_distill.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT:", json.dumps(result), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--out", required=True)
    r.add_argument("--train-steps", type=int, default=3000)
    r.add_argument("--phase-steps", type=int, default=300)
    r.add_argument("--phases", type=int, nargs="+",
                   default=[64, 32, 16, 8, 4],
                   help="first phase folds guidance at the teacher's own "
                        "step count; the rest halve unguided")
    r.add_argument("--student-steps", type=int, default=4)
    r.add_argument("--anchor-steps", type=int, default=25)
    r.add_argument("--cond-scale", type=float, default=3.0)
    r.add_argument("--batch", type=int, default=16)
    r.add_argument("--pool", type=int, default=16)
    r.add_argument("--lr", type=float, default=2e-4)
    r.add_argument("--patches", type=int, default=64)
    r.add_argument("--inception-weights", default=None)
    r.add_argument("--cpu", action="store_true")
    r.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cmd_run(args)


if __name__ == "__main__":
    main()
