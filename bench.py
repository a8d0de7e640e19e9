"""Benchmark: 1024² patches/sec/chip through the 3-stage cascade.

Measures per-denoise-step latency of each stage of the ultra-res cascade
(64 -> 256 -> 1024, the reference's production configuration,
/root/reference/train_ultra_res.py) on the attached TPU chip, then
derives end-to-end cascade throughput at the reference's step counts
(1024/256/256, /root/reference/train.py:91).

Implementation notes:
  * parameters are zero tensors built from eval_shape — dense-compute
    timing is value-independent and this avoids initialising ~1.4B
    params through the device tunnel
  * synchronisation fetches a scalar reduction: on the axon backend
    `block_until_ready` returns before remote execution finishes
  * the reference publishes no numbers (BASELINE.md); vs_baseline is
    against this framework's first recorded value (BENCH_BASELINE.json)
    so later rounds show relative improvement

Prints ONE JSON line.
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_TIMESTEPS = (1024, 256, 256)  # train.py:91
# scan length per measured sample_stage call: production runs 256+ steps
# per call, so per-CALL costs (one-time bf16 weight cast, lowres prep)
# amortize away; 16 keeps compile time sane while halving the per-step
# bias those costs add at 8
BENCH_TIMESTEPS = 16
# production wave batching (sample/gigapixel.py): stages <=256² amortize
# weight streaming across a wave of patches; the 1024² stage saturates
# the chip at batch 1 (measured: batch 2 is 1.37x slower per patch)
STAGE_BATCH = (16, 16, 1)


def zeros_params(cascade, stage):
    shapes = jax.eval_shape(
        lambda: cascade.init_stage_params(jax.random.PRNGKey(stage), stage)
    )
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def sync(x) -> float:
    """Force remote execution to finish; returns a scalar."""
    return float(jnp.mean(x))


def measure():
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import ultra_res

    cfg = ultra_res(0, "v_param")
    cfg = dataclasses.replace(
        cfg,
        stages=tuple(
            dataclasses.replace(st, timesteps=BENCH_TIMESTEPS) for st in cfg.stages
        ),
    )
    cascade = Cascade(cfg)

    per_step = []  # per-step per-PATCH seconds
    for stage in (1, 2, 3):
        B = STAGE_BATCH[stage - 1]
        params = zeros_params(cascade, stage)
        if stage == 1:
            kwargs = {}
        else:
            prev = cfg.stage(stage - 1).image_size
            kwargs = {"lowres_image": jnp.zeros((B, prev, prev, 3))}

        def run(k):
            return cascade.sample_stage(params, stage, k, batch_size=B, **kwargs)

        out = run(jax.random.PRNGKey(0))
        sync(out)  # compile + warmup
        best = float("inf")
        for rep in (1, 2):  # min over two reps damps tunnel jitter
            t0 = time.perf_counter()
            out = run(jax.random.PRNGKey(rep))
            sync(out)
            best = min(best, time.perf_counter() - t0)
        dt = best
        per_step.append(dt / BENCH_TIMESTEPS / B)
        del params, out

    cascade_seconds = sum(t * n for t, n in zip(per_step, REFERENCE_TIMESTEPS))
    return per_step, cascade_seconds


def main():
    per_step, cascade_seconds = measure()
    patches_per_sec = 1.0 / cascade_seconds

    details_path = os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json")
    with open(details_path, "w") as f:
        json.dump(
            {
                "per_denoise_step_per_patch_ms": [t * 1e3 for t in per_step],
                "stage_batch": STAGE_BATCH,
                "reference_timesteps": REFERENCE_TIMESTEPS,
                "cascade_seconds_per_patch": cascade_seconds,
            },
            f,
        )

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = patches_per_sec
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "metric": "1024px_cascade_patches_per_sec_per_chip",
                    "value": patches_per_sec,
                    "per_denoise_step_ms": [t * 1e3 for t in per_step],
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": "1024px_cascade_patches_per_sec_per_chip",
                "value": round(patches_per_sec, 6),
                "unit": "patches/sec/chip",
                "vs_baseline": round(patches_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
