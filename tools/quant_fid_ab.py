#!/usr/bin/env python
"""Quality gate for the quantized serving mode: FID A/B on a trained
flagship stage 3, bf16 vs int8(+fp8-storage) sampling from the SAME
in-process EMA params (no checkpoint round-trip — saving the 631M state
costs ~11 min over the axon tunnel).

Trains `ultra_res(0, "v_param")` stage 3 on the synthetic-tissue set
(tools/sustained_flagship.py harness), then super-resolves held-out
lowres conditions twice — exact bf16 path and the quantized serving
path — and computes FID of each generated set against the held-out
reals (synthetic-weight InceptionV3: valid for RELATIVE comparison,
same caveat as artifacts/r3_flagship/fid.json).

  python tools/quant_fid_ab.py --out artifacts/r3_quant --steps 3000
  python tools/quant_fid_ab.py --out /tmp/q --smoke --cpu   # harness test
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sustained_flagship import (  # noqa: E402
    SyntheticTissue1024, _build, _log, _quant_cascade,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--pool", type=int, default=24)
    ap.add_argument("--patches", type=int, default=48)
    ap.add_argument("--sample-steps", type=int, default=25)
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--storage", default="float8_e4m3fn")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--inception_weights", default=None,
                    help="real pool3 .npz (tools/convert_fid_weights.py); "
                         "default: per-run synthetic weights (relative FID)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from kidney_diffusion_tpu.eval.fid import (
        calculate_fid_given_paths, default_feature_fn,
    )
    from kidney_diffusion_tpu.utils.logging import save_image

    if args.smoke:
        # tiny config has <32-channel convs; open the site gate so the
        # smoke run actually exercises quantized convs
        os.environ.setdefault("KDT_QUANT_MIN_PIX", "1")
        os.environ.setdefault("KDT_QUANT_MIN_CH", "1")

    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "ab.jsonl")

    cascade, trainer = _build(args.lr, smoke=args.smoke)
    size = cascade.config.stage(3).image_size
    ds = SyntheticTissue1024(size=size)

    # ---- train ------------------------------------------------------------
    rng = np.random.default_rng(123)
    pool = []
    for _ in range(args.pool):
        idx = rng.integers(0, len(ds) - 1, args.batch)
        pool.append(
            {"images": jax.device_put(np.stack([ds[int(i)] for i in idx]))}
        )
    _log(log, {"event": "staged", "pool_batches": len(pool)})
    t0 = time.time()
    for step in range(args.steps):
        loss = trainer.train_step(3, pool[step % len(pool)])
        n = step + 1
        if n % 100 == 0 or step == 0 or n == args.steps:
            _log(log, {"stage": 3, "step": n, "loss": round(loss, 5),
                       "t": round(time.time() - t0, 1)})
    ema = trainer.state(3).ema_params

    # ---- held-out reals ---------------------------------------------------
    held = SyntheticTissue1024(n=96 + args.patches, size=size)
    real_dir = os.path.join(args.out, "fid_real")
    os.makedirs(real_dir, exist_ok=True)
    reals = [held[96 + i] for i in range(args.patches)]
    for i, img in enumerate(reals):
        save_image(img, os.path.join(real_dir, f"{i:04d}.png"))

    weights = args.inception_weights
    if weights is None:
        from tests.inception_ref import flax_torch_shapes, synthetic_state_dict

        weights = os.path.join(args.out, "inception_synthetic.npz")
        np.savez(weights, **synthetic_state_dict(flax_torch_shapes()))
    feature_fn = default_feature_fn(weights)

    # ---- A/B sampling + FID ----------------------------------------------
    result = {
        "patches": args.patches, "train_steps": args.steps,
        "sample_steps": args.sample_steps,
        "model": "ultra_res(0, v_param) stage 3",
        "quant": args.quant, "storage": args.storage,
        "inception_weights": args.inception_weights or "synthetic",
    }
    modes = (
        ("bf16", None, None),
        (f"{args.quant}+{args.storage or 'bf16store'}", args.quant,
         args.storage or None),
    )
    for name, quant, storage in modes:
        cas = _quant_cascade(cascade, quant, storage)
        gen_dir = os.path.join(args.out, f"fid_gen_{name}")
        os.makedirs(gen_dir, exist_ok=True)
        ts = time.time()
        for i, img in enumerate(reals):
            out = cas.sample_stage(
                ema, 3, jax.random.PRNGKey(2000 + i), batch_size=1,
                lowres_image=img[None, ::4, ::4],
                dpmpp_steps=args.sample_steps,
            )
            save_image(np.asarray(out)[0], os.path.join(gen_dir, f"{i:04d}.png"))
        wall = time.time() - ts
        fid = calculate_fid_given_paths((real_dir, gen_dir), feature_fn=feature_fn)
        result[f"fid_{name}"] = float(fid)
        result[f"sample_wall_s_{name}"] = round(wall, 1)
        _log(log, {"event": "fid", "mode": name, "fid": float(fid),
                   "sample_wall_s": round(wall, 1)})

    with open(os.path.join(args.out, "fid_ab.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT:", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
