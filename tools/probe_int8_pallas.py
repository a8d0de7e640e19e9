"""Probe: int8 MXU dot inside a Pallas TPU kernel.

Gate experiment for an int8 path in kernels/conv3x3.py's Pallas kernel
(PERF.md round 3): measures whether Mosaic lowers
`dot_general(int8, int8, preferred_element_type=int32)` onto the MXU's
double rate, vs the same-shape bf16 dot, at the flagship conv tile
shape ((TH*W, Cin) x (Cin, Cout)).

Usage: /opt/venv/bin/python tools/probe_int8_pallas.py [--cpu]
Prints one JSON line per variant.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8 * 1024, 128, 128  # one row-tile of the 1024² stage, 9 taps worth
TAPS = 9
REPS = 64


def kernel_bf16(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, N), jnp.float32)
    for t in range(TAPS):
        acc += jax.lax.dot_general(
            x_ref[:], w_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc.astype(jnp.bfloat16)


def kernel_int8(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, N), jnp.int32)
    for t in range(TAPS):
        acc += jax.lax.dot_general(
            x_ref[:], w_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[:] = (acc.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)


def kernel_int8_quantize(x_ref, w_ref, s_ref, o_ref):
    """bf16 input quantized in-VMEM with a given scale, then int8 dots —
    the shape of the real conv kernel's quant path."""
    s = s_ref[0, 0]
    xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    acc = jnp.zeros((M, N), jnp.int32)
    for t in range(TAPS):
        acc += jax.lax.dot_general(
            xq, w_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[:] = (acc.astype(jnp.float32) * (s * 1e-2)).astype(jnp.bfloat16)


def run(name, kernel, args_builder):
    args, in_specs = args_builder()
    fn = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
    )

    @jax.jit
    def many(*a):
        def body(c, _):
            return c + jnp.mean(fn(*a)), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=REPS)
        return out

    try:
        float(many(*args))  # compile + warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(many(*args))
            best = min(best, time.perf_counter() - t0)
        per_call_us = best / REPS * 1e6
        tops = 2 * M * K * N * TAPS / (best / REPS) / 1e12
        print(json.dumps({"variant": name, "us_per_call": round(per_call_us, 1),
                          "effective_tops": round(tops, 2)}))
    except Exception as e:  # noqa: BLE001 — report and continue probing
        print(json.dumps({"variant": name, "error": str(e)[:300]}))


def main():
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)

    def bf16_args():
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(TAPS, K, N)) * 0.1, jnp.bfloat16)
        return (x, w), [vmem, vmem]

    def int8_args():
        x = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (TAPS, K, N)), jnp.int8)
        return (x, w), [vmem, vmem]

    def quant_args():
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.integers(-127, 127, (TAPS, K, N)), jnp.int8)
        s = jnp.full((1, 1), 0.031, jnp.float32)
        return (x, w, s), [vmem, vmem, pl.BlockSpec(memory_space=pltpu.SMEM)]

    run("bf16_dot", kernel_bf16, bf16_args)
    run("int8_dot", kernel_int8, int8_args)
    run("int8_quantize_dot", kernel_int8_quantize, quant_args)


if __name__ == "__main__":
    main()
