"""A/B harness: flagship stage-3 per-denoise-step latency vs
UNetConfig.storage_dtype (narrow activation storage, PERF.md round 3).

Times `Cascade.sample_stage` for stage 3 of `ultra_res(0, "v_param")`
at batch 1 on the attached TPU, scan-amortized exactly like bench.py
(zero params from eval_shape; sync via scalar fetch — on the axon
backend block_until_ready returns early).

Usage:
    /opt/venv/bin/python tools/perf_stage3_fwd.py none
    /opt/venv/bin/python tools/perf_stage3_fwd.py float8_e4m3fn
    /opt/venv/bin/python tools/perf_stage3_fwd.py none int8   # w8a8 convs

Prints one JSON line per run. Env: KDT_PERF_T (scan length, default 48),
KDT_PERF_CHUNKS (spatial_chunks override), KDT_QUANT_MIN_PIX (site gate).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def sync(x) -> float:
    return float(jnp.mean(x))


def main():
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import ultra_res

    storage = sys.argv[1] if len(sys.argv) > 1 else "none"
    storage = None if storage in ("none", "None", "") else storage
    quant = sys.argv[2] if len(sys.argv) > 2 else None
    quant = None if quant in ("none", "None", "") else quant
    T = int(os.environ.get("KDT_PERF_T", "48"))
    chunks = os.environ.get("KDT_PERF_CHUNKS")

    cfg = ultra_res(0, "v_param")
    stages = list(cfg.stages)
    unet = dataclasses.replace(
        stages[2].unet,
        storage_dtype=storage,
        quant_conv=quant,
        **({"spatial_chunks": int(chunks)} if chunks else {}),
    )
    stages[2] = dataclasses.replace(stages[2], unet=unet, timesteps=T)
    cfg = dataclasses.replace(cfg, stages=tuple(stages))
    cascade = Cascade(cfg)

    shapes = jax.eval_shape(
        lambda: cascade.init_stage_params(jax.random.PRNGKey(3), 3)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    lowres = jnp.zeros((1, 256, 256, 3))

    def run(k):
        return cascade.sample_stage(
            params, 3, k, batch_size=1, lowres_image=lowres
        )

    t0 = time.perf_counter()
    sync(run(jax.random.PRNGKey(0)))  # compile + warmup
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for rep in (1, 2, 3):
        t0 = time.perf_counter()
        sync(run(jax.random.PRNGKey(rep)))
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "storage_dtype": storage or "bf16 (none)",
                "quant_conv": quant,
                "quant_min_pix": os.environ.get("KDT_QUANT_MIN_PIX"),
                "spatial_chunks": unet.spatial_chunks,
                "timesteps": T,
                "per_step_ms": round(best / T * 1e3, 3),
                "total_s": round(best, 3),
                "compile_warmup_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
