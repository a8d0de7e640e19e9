#!/usr/bin/env python
"""Kumar cascade quality artifact — the north star's named benchmark.

BASELINE.json's target is "matched FID on the Kumar test set"
(/root/reference/train_kumar.py: a 2-stage 64->256 cascade conditioned
on binary nuclei masks + (type, disease) metadata). Round 3 recorded
only a stage-1 loss smoke (artifacts/r3_kumar); this tool trains BOTH
Kumar stages on-chip and evaluates CASCADE-level FID — mask+metadata
conditioned 64->256 generation against held-out patches — at three
points (fresh init, stage-2 midpoint, final), mirroring the
artifacts/r3_flagship/fid.json protocol. All FID numbers are RELATIVE
(synthetic-weight InceptionV3) until the real pool3 checkpoint exists
(tools/convert_fid_weights.py --verify).

The dataset is the synthetic TCGA-layout fixture of the r3 smoke,
extended so the conditioning is LEARNABLE: images are deterministic
functions of the nuclei mask (stained-nuclei rendering) and the
(type, disease) pair (background hue), so falling cascade FID measures
real conditional learning, not memorized noise.

    nohup /opt/venv/bin/python tools/kumar_cascade.py \
        --out artifacts/r4_kumar > /tmp/kumar_r4.log 2>&1 &
    python tools/kumar_cascade.py --out /tmp/k --smoke --cpu  # plumbing
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _log(path, rec):
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


# ---------------------------------------------------------------------------
# synthetic Kumar data (TCGA layout) with mask/metadata-correlated images
# ---------------------------------------------------------------------------


def _nuclei_mask(rng, size):
    """Binary mask of elliptical nuclei (the Kumar label format)."""
    m = np.zeros((size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(rng.integers(14, 26)):
        cy, cx = rng.uniform(0, size, 2)
        a, b = rng.uniform(size * 0.02, size * 0.06, 2)
        th = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        u = dy * np.cos(th) + dx * np.sin(th)
        v = -dy * np.sin(th) + dx * np.cos(th)
        m[(u / a) ** 2 + (v / b) ** 2 <= 1.0] = 1.0
    return m


def _render(rng, mask, t_norm, d_norm, size):
    """H&E-like rendering: eosin background whose hue tracks the
    metadata, hematoxylin nuclei where the mask is set."""
    bg = np.array([0.92 - 0.25 * t_norm, 0.62 + 0.2 * d_norm, 0.78],
                  np.float32)
    nuc = np.array([0.35, 0.18, 0.52], np.float32)
    img = np.empty((size, size, 3), np.float32)
    img[:] = bg
    tex = rng.normal(0, 0.02, size=(size, size, 1)).astype(np.float32)
    edge = mask[..., None]
    img = img * (1 - edge) + nuc[None, None] * edge
    img += tex
    # chromatin texture inside nuclei
    img -= 0.08 * edge * rng.uniform(0, 1, size=(size, size, 1)).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def write_kumar_fixture(root: str, n: int, size: int = 400, seed: int = 0):
    """TCGA-layout tree readable by data/kumar.KumarDataset."""
    from kidney_diffusion_tpu.data.kumar import (
        DISEASES, TYPES, normalize_disease, normalize_type,
    )

    os.makedirs(os.path.join(root, "Supplementary"), exist_ok=True)
    os.makedirs(os.path.join(root, "Patches"), exist_ok=True)
    os.makedirs(os.path.join(root, "Labels"), exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = ["ID;Type;Disease"]
    for i in range(n):
        pid = f"syn{i:03d}x"
        t = TYPES[int(rng.integers(0, len(TYPES)))]
        d = DISEASES[int(rng.integers(0, len(DISEASES)))]
        rows.append(f"{pid};{t};{d}")
        mask = _nuclei_mask(rng, size)
        img = _render(rng, mask, normalize_type(t), normalize_disease(d), size)
        np.save(os.path.join(root, "Patches", f"{pid[:-1]}.npy"),
                (img * 255).astype(np.uint8))
        np.save(os.path.join(root, "Labels", f"{pid}binary_mask.npy"),
                mask.astype(np.uint8))
    with open(os.path.join(root, "Supplementary", "supplementary.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def build_cascade(smoke: bool):
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import kumar, tiny_test_cascade

    if smoke:
        cfg = tiny_test_cascade(
            condition_on_text=True, cond_images_channels=1,
            image_sizes=(16, 32), timesteps=8,
        )
        cfg = dataclasses.replace(cfg, text_embed_dim=2, name="kumar-smoke")
        cfg = dataclasses.replace(
            cfg,
            stages=tuple(
                dataclasses.replace(
                    s, unet=dataclasses.replace(s.unet, text_embed_dim=2)
                )
                for s in cfg.stages
            ),
        )
        return Cascade(cfg)
    return Cascade(kumar())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--data", default="/tmp/kumar_r4_data")
    ap.add_argument("--steps1", type=int, default=2000)
    ap.add_argument("--steps2", type=int, default=2000)
    ap.add_argument("--batch1", type=int, default=16)
    ap.add_argument("--batch2", type=int, default=4)
    ap.add_argument("--fid-patches", type=int, default=24)
    ap.add_argument("--dpmpp-steps", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--train-items", type=int, default=48)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from kidney_diffusion_tpu.data.kumar import KumarDataset
    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.train import Trainer
    from kidney_diffusion_tpu.utils.logging import save_image

    if args.smoke:
        args.steps1, args.steps2 = 6, 6
        args.batch1 = args.batch2 = 2
        args.fid_patches = 4
        args.dpmpp_steps = 4
        args.train_items = 6

    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "loss.jsonl")

    # ---- data -------------------------------------------------------------
    n_total = args.train_items + args.fid_patches
    patch_px = 64 if args.smoke else 400
    # regenerate unless an existing fixture matches THIS run's geometry —
    # a stale smoke-size fixture silently upscaling 64² patches to 256²
    # would invalidate the benchmark (cost one aborted on-chip run, r4)
    marker = os.path.join(args.data, "fixture.json")
    want = {"n": n_total, "size": patch_px}
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f)
    if have != want:
        import shutil

        if os.path.isdir(args.data):
            shutil.rmtree(args.data)
        write_kumar_fixture(args.data, n_total, size=patch_px)
        with open(marker, "w") as f:
            json.dump(want, f)
    ds = KumarDataset(args.data, patch_size=32 if args.smoke else 256)
    per_item = len(ds) // n_total  # index-encoded augmentation factor

    cascade = build_cascade(args.smoke)

    # device-staged batch pool (CLAUDE.md: per-call numpy batches pay a
    # ~13 MB tunnel upload per step); stage_loss resizes images/conds to
    # each stage's size in-model (the reference feeds every unet the
    # same 256² loader output too). Indices restricted to TRAIN items.
    _pools = {}

    def batch_for(rng, bsz):
        if bsz not in _pools:
            pool = []
            for _ in range(24):
                idx = rng.integers(0, args.train_items * per_item, bsz)
                items = [ds[int(i)] for i in idx]
                pool.append({
                    "images": jax.device_put(
                        np.stack([p for p, _, _ in items])
                    ),
                    "text_embeds": jax.device_put(
                        np.stack([c for _, c, _ in items])
                    ),
                    "cond_images": jax.device_put(
                        np.stack([m for _, _, m in items])
                    ),
                })
            _pools[bsz] = [pool, 0]
        pool, k = _pools[bsz]
        _pools[bsz][1] = k + 1
        return pool[k % len(pool)]

    # ---- held-out reals + conditioning for FID ----------------------------
    held = []
    for k in range(args.fid_patches):
        held.append(ds[(args.train_items + k) * per_item])  # un-flipped crop 0
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    for i, (patch, _, _) in enumerate(held):
        save_image(patch, os.path.join(real_dir, f"{i:04d}.png"))
    cond_images = np.stack([m for _, _, m in held])
    text_embeds = np.stack([c for _, c, _ in held])

    from tests.inception_ref import flax_torch_shapes, synthetic_state_dict

    weights = os.path.join(args.out, "inception_synthetic.npz")
    np.savez(weights, **synthetic_state_dict(flax_torch_shapes()))
    feature_fn = default_feature_fn(weights)

    params_by_stage = {}

    def cascade_eval(tag, params1, params2):
        gen_dir = os.path.join(args.out, f"fid_gen_{tag}")
        os.makedirs(gen_dir, exist_ok=True)
        t0 = time.time()
        bsz = 4 if not args.smoke else 2
        outs = []
        for s in range(0, args.fid_patches, bsz):
            b = min(bsz, args.fid_patches - s)
            pad = bsz - b
            ci = np.concatenate([cond_images[s : s + b]] + [cond_images[s : s + 1]] * pad)
            te = np.concatenate([text_embeds[s : s + b]] + [text_embeds[s : s + 1]] * pad)
            out = cascade.sample(
                [params1, params2], jax.random.PRNGKey(7000 + s),
                batch_size=bsz, cond_images=ci, text_embeds=te,
                dpmpp_steps=args.dpmpp_steps,
            )
            outs.append(np.asarray(out)[:b])
        gen = np.concatenate(outs)
        for i in range(args.fid_patches):
            save_image(gen[i], os.path.join(gen_dir, f"{i:04d}.png"))
        fid = float(calculate_fid_given_paths((real_dir, gen_dir),
                                              feature_fn=feature_fn))
        _log(log, {"event": "fid", "tag": tag, "fid": round(fid, 4),
                   "wall_s": round(time.time() - t0, 1)})
        return fid

    result = {
        "model": "kumar 2-stage 64->256 cascade"
                 if not args.smoke else "kumar-smoke",
        "dataset": f"synthetic TCGA-layout fixture ({args.train_items} train "
                   f"+ {args.fid_patches} held-out, mask/metadata-correlated)",
        "steps": [args.steps1, args.steps2],
        "batch": [args.batch1, args.batch2],
        "dpmpp_steps": args.dpmpp_steps,
        "fid_patches": args.fid_patches,
    }

    # ---- point 0: fresh init ---------------------------------------------
    rng = np.random.default_rng(42)
    init1 = cascade.init_stage_params(jax.random.PRNGKey(1), 1)
    init2 = cascade.init_stage_params(jax.random.PRNGKey(2), 2)
    result["fid_init"] = cascade_eval("init", init1, init2)

    # ---- stage 1 ----------------------------------------------------------
    import jax.numpy as jnp

    from kidney_diffusion_tpu.train.trainer import StageState

    for stage, steps, bsz in (
        (1, args.steps1, args.batch1),
        (2, args.steps2, args.batch2),
    ):
        tr = Trainer(cascade, max_grad_norm=1.0, lr=args.lr,
                     only_train_unet_number=stage)
        # seed the trainer with the SAME init params the init-point FID
        # measured (bench/__graft_entry__ injection pattern)
        init = init1 if stage == 1 else init2
        tr._states[stage] = tr._place_state(
            StageState(
                params=init,
                ema_params=jax.tree.map(
                    lambda p: jnp.array(p, jnp.float32, copy=True), init
                ),
                opt_state=tr._optimizer().init(init),
                step=jnp.zeros((), jnp.int32),
            )
        )
        if stage == 1:
            init1 = None
        else:
            init2 = None
        del init
        t0 = time.time()
        for step in range(steps):
            loss = tr.train_step(stage, batch_for(rng, bsz))
            n = step + 1
            if n % 100 == 0 or step == 0 or n == steps:
                _log(log, {"stage": stage, "step": n, "loss": round(loss, 5),
                           "t": round(time.time() - t0, 1)})
            if n in (steps // 2, steps):
                # unique-name mid/final checkpoints per stage — the
                # reference's --save_freq behavior (train_uncond.py:197)
                ck = os.path.join(args.out, f"ckpt_s{stage}_step{n}")
                tr.save(ck)
                _log(log, {"event": "checkpoint", "stage": stage,
                           "step": n, "path": ck})
            if stage == 2 and n == steps // 2:
                result["fid_mid"] = cascade_eval(
                    "s1final_s2mid", params_by_stage[1], tr.state(2).ema_params
                )
        params_by_stage[stage] = tr.state(stage).ema_params
        tr.drop_state(stage)
        del tr

    # ---- final ------------------------------------------------------------
    result["fid_final"] = cascade_eval(
        "final", params_by_stage[1], params_by_stage[2]
    )
    result["fid_trend"] = [result["fid_init"],
                           result.get("fid_mid"), result["fid_final"]]
    with open(os.path.join(args.out, "fid.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT:", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
