"""Pallas TPU fused attention.

The U-Net's self-attention runs at 1024-4096 tokens (32²/64² feature
maps). The XLA fallback materialises (B, H, N, N) logits in HBM; this
kernel keeps K/V and the per-block score matrix in VMEM — one pass, no
HBM round trip for the attention matrix.

Design (shapes here are small enough that full-K-in-VMEM beats a
flash-style online softmax): grid over (batch·heads, query blocks);
each program holds one (BQ, D) query block plus the full (N, D) K and V
for its head in VMEM, computes the (BQ, N) scores on the MXU in fp32,
softmaxes, and applies V. Padded key positions (from appended context
tokens) are masked with -inf via a static valid-length closure.

Falls back to plain jnp attention off-TPU or for unsupported shapes
(`attention(..., force_xla=True)`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_BQ = 128  # query block (sublane-aligned)
_LANE = 128


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (NK, D)
    v = v_ref[0]  # (NK, D)
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, NK)
    nk = k.shape[0]
    if n_valid < nk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_to(x: Array, axis: int, mult: int) -> Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    """q: (BH, NQ, D); k/v: (BH, NK, D) — NQ % 128 == 0 assumed after pad."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5

    nq_pad = (-nq) % _BQ
    q_in = _pad_to(q, 1, _BQ)
    k_in = _pad_to(k, 1, _LANE)
    v_in = _pad_to(v, 1, _LANE)
    nq_blocks = q_in.shape[1] // _BQ
    nk_padded = k_in.shape[1]

    kernel = functools.partial(_attention_kernel, scale=scale, n_valid=nk)
    out = pl.pallas_call(
        kernel,
        grid=(bh, nq_blocks),
        in_specs=[
            pl.BlockSpec((1, _BQ, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_padded, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_padded, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BQ, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(q_in.shape, q.dtype),
        interpret=interpret,
    )(q_in, k_in, v_in)
    if nq_pad:
        out = out[:, :nq]
    return out


def xla_attention(q: Array, k: Array, v: Array) -> Array:
    """Reference implementation over (B, N, H, D)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def _supported(q: Array, k: Array) -> bool:
    """Dispatch heuristic, measured on v5e: the kernel wins for large
    self-attention (2.16x at N=4096) but loses for small maps and for
    cross-attention with few kv tokens (lane padding turns a (N, 4)
    score matmul into (N, 128)). XLA handles those better."""
    d = q.shape[-1]
    return d % 8 == 0 and q.shape[1] >= 2048 and k.shape[1] >= 512


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    force_xla: bool = False,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused attention over (B, N, H, D) tensors (keys may be longer than
    queries — context tokens appended). Dispatches to the Pallas kernel
    on TPU, XLA einsum elsewhere; `interpret=True` forces the Pallas
    interpreter (kernel tests)."""
    if interpret is None:
        if not on_tpu():
            return xla_attention(q, k, v)
        interpret = False
    if force_xla or not _supported(q, k):
        return xla_attention(q, k, v)
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qT = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kT = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vT = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    out = _fused_attention(qT, kT, vT, interpret=interpret)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)
