"""Benchmark: 1024² patches/sec/chip through the 3-stage cascade.

Measures the flagship workload (BASELINE.json): per-denoise-step latency
of each stage of the ultra-res cascade (64 -> 256 -> 1024, the
reference's production configuration, /root/reference/train_ultra_res.py)
with randomly initialised weights on the attached TPU chip, then derives
end-to-end cascade throughput at the reference's step counts
(1024/256/256, train.py:91).

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against this framework's round-1 value recorded in
BENCH_BASELINE.json (created on first run), so later rounds show
relative improvement. Prints ONE JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# reference step counts per stage (train.py:91)
REFERENCE_TIMESTEPS = (1024, 256, 256)
BENCH_TIMESTEPS = 8  # steps actually run per stage (per-step time is flat)
BATCH = 1  # the reference's gigapixel flow samples 1 patch per device pass


def measure():
    import dataclasses

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import ultra_res

    cfg = ultra_res(0, "v_param")
    # shrink the sampling discretisation; per-step cost is unchanged
    cfg = dataclasses.replace(
        cfg,
        stages=tuple(
            dataclasses.replace(st, timesteps=BENCH_TIMESTEPS) for st in cfg.stages
        ),
    )
    cascade = Cascade(cfg)

    key = jax.random.PRNGKey(0)
    per_step = []
    lowres = None
    for stage in (1, 2, 3):
        params = cascade.init_stage_params(jax.random.PRNGKey(stage), stage)
        kwargs = {}
        if stage > 1:
            kwargs["lowres_image"] = lowres

        def run(k):
            return cascade.sample_stage(
                params, stage, k, batch_size=BATCH, **kwargs
            )

        out = jax.block_until_ready(run(key))  # compile + warmup
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(jax.random.PRNGKey(1)))
        dt = time.perf_counter() - t0
        per_step.append(dt / BENCH_TIMESTEPS)
        lowres = out
        del params

    cascade_seconds = sum(
        t * n for t, n in zip(per_step, REFERENCE_TIMESTEPS)
    )
    return per_step, cascade_seconds


def main():
    per_step, cascade_seconds = measure()
    patches_per_sec = BATCH / cascade_seconds

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
                    "per_denoise_step_seconds": per_step,
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
