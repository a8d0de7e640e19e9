"""Pallas TPU fused 3x3 convolution for the super-res U-Net hot path.

Motivation (measured on v5e, see PERF.md): XLA's spatial convolution at
the 1024² stage's fat shapes (1024²/512² maps, 128-256 channels) runs at
~3x its compute floor — the im2col lowering re-reads the input per tap.
This kernel holds a halo'd row-tile of the input in VMEM and computes
the 9 taps as MXU matmuls against a (Cin, Cout) slice of the weights,
reading the input once.

It also fuses the surrounding ResnetBlock elementwise work
(models/blocks.py:Block = conv -> GroupNorm -> FiLM -> SiLU — the
per-step U-Net forward inside the reference's sampling hot loop,
/root/reference/sample_ultra_res.py:183-195):

  * prologue: per-(batch, channel) affine + SiLU applied to the input
    while it is in VMEM — this is the PREVIOUS GroupNorm-apply + FiLM
    folded to `silu(x * a + c)` form, so the normalized activation map
    never round-trips through HBM;
  * epilogue: per-channel sum / sum-of-squares of the conv output,
    accumulated across the grid — the NEXT GroupNorm's statistics for
    free (no separate reduction pass over the map).

Grid: (batch, H/TH) over row-tiles of the NHWC input. The one-row halos
come from two small side inputs (the tile-boundary rows, strided-sliced
out in XLA at 2/TH of a map's traffic) so every tensor uses plain
auto-pipelined BlockSpecs — no manual DMA.

Gradients: `conv3x3` carries a custom VJP whose backward differentiates
the XLA reference implementation — the kernel is for the sampling hot
loop; training steps recompute through XLA.

Falls back to XLA off-TPU or for unsupported shapes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_LANE = 128
# VMEM working-set budget per grid step, in estimate-space: the chip's
# scoped limit is 16 MB and _tile_bytes overcounts by ~10% (calibrated
# against an observed Mosaic OOM: estimate 19.7 MB -> actual 17.6 MB)
_VMEM_BUDGET = 16 * 1024 * 1024


def _tile_bytes(th: int, w: int, cin: int, cout: int) -> int:
    """Estimate of the kernel's VMEM working set for a TH-row tile:
    double-buffered input + output blocks, the prologue'd copy plus a
    shifted/concat temporary, the fp32 accumulator, and the weights."""
    pix = th * w
    return (
        2 * pix * cin * 2        # input block x2 buffers
        + 2 * pix * cin * 2      # prologue'd copy + shifted/concat temp
        + 2 * pix * cout * 2     # output block x2 buffers
        + pix * cout * 4         # fp32 accumulator
        + 2 * 9 * cin * cout * 2  # weights x2 buffers
        + 2 * w * cin * 2        # halo scratch rows
    )


def _pick_th(h: int, w: int, cin: int, cout: int) -> Optional[int]:
    best = None
    for th in (1, 2, 4, 8, 16):
        if h % th == 0 and _tile_bytes(th, w, cin, cout) <= _VMEM_BUDGET:
            best = th
    return best


def _shift_w(x: Array, dx: int) -> Array:
    """Shift along the W axis with zero fill; x: (rows, W, C)."""
    if dx == 0:
        return x
    if dx == 1:  # tap reads column w+1 -> shift left
        return jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
    return jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))  # dx == -1


def _kernel(
    x_hbm,      # full (B, H, W, Cin) in HBM/ANY — halo-row DMA source
    x_ref,      # (1, TH, W, Cin) blocked in VMEM
    w_ref,      # (9, Cin, Cout)
    b_ref,      # (8, Cout) fp32; row 0 = bias
    pro_ref,    # (1, 8, Cin) fp32; rows 0/1 = prologue a/c  (or None)
    y_ref,      # out (1, TH, W, Cout)
    s_ref,      # out (1, 8, Cout) fp32; rows 0/1 = sum/sumsq  (or None)
    halo,       # scratch (2, W, Cin): row 0 = halo above, row 1 = below
    sem,        # DMA semaphores (2,)
    *,
    th: int,
    with_prologue: bool,
    with_stats: bool,
    out_dtype,
    chunks: int = 0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bi = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    # Image-boundary predicates. Unchunked (chunks == 0): batch item bi IS
    # one image, boundaries are tiles 0 / n_i-1. Row-chunked layout
    # (models/unet.py spatial_chunks): batch item bi is chunk (bi % chunks)
    # of an image whose chunks are contiguous top-to-bottom, so interior
    # chunk boundaries pull their halo row from the NEIGHBOUR chunk's
    # edge row — same semantics as halo_pad() without materialising the
    # (rows+2)-padded copy in HBM.
    if chunks:
        at_img_top = (i == 0) & (bi % chunks == 0)
        at_img_bot = (i == n_i - 1) & (bi % chunks == chunks - 1)
        top_b = jnp.where(i == 0, bi - 1, bi)
        top_r = jnp.where(i == 0, n_i * th - 1, i * th - 1)
        bot_b = jnp.where(i == n_i - 1, bi + 1, bi)
        bot_r = jnp.where(i == n_i - 1, 0, i * th + th)
        # clamp for the masked-off boundary cases (DMA is gated but the
        # address computation must stay in range)
        nb = pl.num_programs(0)
        top_b = jnp.clip(top_b, 0, nb - 1)
        bot_b = jnp.clip(bot_b, 0, nb - 1)
        top_r = jnp.clip(top_r, 0, n_i * th - 1)
        bot_r = jnp.clip(bot_r, 0, n_i * th - 1)
    else:
        at_img_top = i == 0
        at_img_bot = i == n_i - 1
        top_b = bot_b = bi
        top_r = jnp.maximum(i * th - 1, 0)
        bot_r = jnp.minimum(i * th + th, n_i * th - 1)

    # the two one-row halos come straight from HBM: a blocked side-input
    # would read TH extra rows per tile, and a host-side strided slice
    # lowers to a row gather (measured: pathological at 1024²)
    top_dma = pltpu.make_async_copy(
        x_hbm.at[top_b, pl.ds(top_r, 1)],
        halo.at[pl.ds(0, 1)],
        sem.at[0],
    )
    bot_dma = pltpu.make_async_copy(
        x_hbm.at[bot_b, pl.ds(bot_r, 1)],
        halo.at[pl.ds(1, 1)],
        sem.at[1],
    )

    @pl.when(jnp.logical_not(at_img_top))
    def _():
        top_dma.start()

    @pl.when(jnp.logical_not(at_img_bot))
    def _():
        bot_dma.start()

    def prologue(v):
        if not with_prologue:
            return v
        a = pro_ref[0, 0][None, None, :]           # (1, 1, Cin)
        c = pro_ref[0, 1][None, None, :]
        f = v.astype(jnp.float32) * a + c
        return (f * jax.nn.sigmoid(f)).astype(v.dtype)  # SiLU

    w_all = w_ref[:]                               # (9, Cin, Cout)
    cout = w_all.shape[-1]
    wid = x_ref.shape[2]

    def taps(rows, dy, acc):
        for dx in range(3):
            xsd = _shift_w(rows, dx - 1).reshape(th * wid, -1)
            acc += jax.lax.dot_general(
                xsd,
                w_all[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    xp = prologue(x_ref[0])                        # (TH, W, Cin)
    acc = jnp.zeros((th * wid, cout), jnp.float32)
    acc = taps(xp, 1, acc)                         # middle taps overlap the DMAs

    @pl.when(jnp.logical_not(at_img_top))
    def _():
        top_dma.wait()

    @pl.when(jnp.logical_not(at_img_bot))
    def _():
        bot_dma.wait()

    hp = prologue(halo[:])                         # (2, W, Cin)
    # conv SAME zero padding at the image boundary — AFTER the prologue
    # (padding is zeros in conv-input space)
    row = jax.lax.broadcasted_iota(jnp.int32, (2, 1, 1), 0)
    pad = (at_img_top & (row == 0)) | (at_img_bot & (row == 1))
    hp = jnp.where(pad, jnp.zeros_like(hp), hp)

    acc = taps(jnp.concatenate([hp[0:1], xp[: th - 1]], axis=0), 0, acc)
    acc = taps(jnp.concatenate([xp[1:], hp[1:2]], axis=0), 2, acc)

    if with_stats:
        # accumulate raw sums of the PRE-bias output; the host-side
        # finisher turns them into [sum(y), centered sumsq] (bias folded
        # in exactly, variance shift-invariant — see xla_conv3x3)
        @pl.when(i == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)

        s1 = jnp.sum(acc, axis=0)
        s2 = jnp.sum(acc * acc, axis=0)
        s_ref[0, 0, :] += s1
        s_ref[0, 1, :] += s2

    acc += b_ref[0][None, :]
    y_ref[0] = acc.reshape(th, wid, cout).astype(out_dtype)


def halo_pad(x: Array, chunks: int) -> Array:
    """Exchange one halo row between adjacent row-chunks of each image.

    `x` is (B*chunks, rows, W, C) with an image's chunks contiguous and
    in top-to-bottom order. Returns (B*chunks, rows+2, W, C): each
    chunk gains its upper neighbour's last row on top and its lower
    neighbour's first row at the bottom; image borders get zeros (the
    SAME-conv padding). A 3x3 VALID-H conv on the result is then exactly
    the SAME conv on the unchunked image — this keeps big spatial convs
    in a batch-of-chunks form XLA lowers directly, instead of letting
    its space-to-batch pass materialise per-conv halo copies (PERF.md
    round-2 analysis)."""
    bc, rows, w, c = x.shape
    assert bc % chunks == 0, (bc, chunks)
    x5 = x.reshape(bc // chunks, chunks, rows, w, c)
    z = jnp.zeros((bc // chunks, 1, 1, w, c), x.dtype)
    top = jnp.concatenate([z, x5[:, :-1, -1:]], axis=1)
    bot = jnp.concatenate([x5[:, 1:, :1], z], axis=1)
    out = jnp.concatenate([top, x5, bot], axis=2)
    return out.reshape(bc, rows + 2, w, c)


def _int8_conv(x: Array, w: Array, chunks: int, a_max: Optional[Array] = None) -> Array:
    """w8a8 symmetric quantized 3x3 conv -> fp32 output.

    Weights per-output-channel, activations per-tensor, both quantized
    IN-GRAPH from the bf16/fp32 params — no separate quantized
    checkpoint. The int8 conv runs on the MXU's double-rate int8 path
    (measured 1.7x at the flagship 1024²-extent shapes, PERF.md round 3).

    `a_max`: precomputed bound on max|x| (a traced fp32 scalar). When
    given, the activation scale needs NO reduction over `x`, so the
    quantize is a pure elementwise consumer of `x` — XLA fuses it into
    the pass that already reads/produces the activation instead of
    scheduling a separate amax pass + a dependent quantize pass
    (cost_stage3.py: dynamic amax costs ~5 GB/fwd extra on the flagship
    stage 3). The bounds come from the conv stats/range epilogues and
    exact range algebra in models/blocks.py; values above the bound
    (there are none when the bound is exact) would CLIP, not wrap.
    Without `a_max` the scale is the dynamic per-tensor amax, reduced in
    the input dtype (|x| is exact in fp8/bf16; upcasting first made XLA
    share a 4-byte copy between the reduce and the quantize).

    int32 accumulation is exact (9 * 1024 * 127² < 2^31)."""
    if a_max is not None:
        s_a = jnp.maximum(a_max.astype(jnp.float32), 1e-8) / 127.0
    else:
        s_a = jnp.maximum(
            jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8
        ) / 127.0
    xf = x.astype(jnp.float32)
    xq = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / s_w[None, None, None, :]), -127, 127).astype(
        jnp.int8
    )
    if chunks:
        y = jax.lax.conv_general_dilated(
            halo_pad(xq, chunks),
            wq,
            window_strides=(1, 1),
            padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    else:
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return y.astype(jnp.float32) * (s_a * s_w)[None, None, None, :]


def xla_conv3x3(
    x: Array,
    w: Array,
    b: Optional[Array],
    pro: Optional[Array] = None,
    want_stats: bool = False,
    chunks: int = 0,
    quant: bool = False,
    a_max: Optional[Array] = None,
    want_range: bool = False,
):
    """Reference implementation (and gradient path). x: (B, H, W, Cin)
    NHWC; w: (3, 3, Cin, Cout); pro: (B, 2, Cin) fp32 prologue [a; c].
    chunks>0: `x` is (B*chunks, rows, W, Cin) row-chunked; the conv runs
    VALID-H over halo-exchanged chunks (exact SAME-conv semantics) and
    stats are per-chunk (aggregate with gn_film_affine(chunks=...)).
    quant: w8a8 int8 serving path (_int8_conv); the bias/stats epilogue
    operates on the dequantized fp32 output unchanged. `a_max`: bound on
    max|conv input| (AFTER the pro prologue if given) — see _int8_conv.
    want_range: additionally return per-channel [max, min] of the
    POST-bias output as a (B, 2, Cout) fp32 array (per-chunk when
    chunked) — reductions that join the stats epilogue's existing pass,
    used by models/blocks.py to propagate exact activation ranges for
    quantization scales."""
    if pro is not None:
        a = pro[:, 0][:, None, None, :]
        c = pro[:, 1][:, None, None, :]
        f = x.astype(jnp.float32) * a + c
        # stay in compute dtype even when quantizing (an fp32 copy would
        # double the tensor's bytes if XLA chose to materialise it;
        # measured neutral, kept for byte-safety)
        x = jax.nn.silu(f).astype(x.dtype)
    if quant:
        y = _int8_conv(x, w, chunks, a_max)
    elif chunks:
        xh = halo_pad(x, chunks)
        y = jax.lax.conv_general_dilated(
            xh,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    else:
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    z = y  # pre-bias conv output
    if b is not None:
        y = y + b.astype(jnp.float32)[None, None, None, :]
    out = y.astype(x.dtype)
    ranges = None
    if want_range:
        if want_stats:
            # post-bias per-channel range from pre-bias reduces (+b is
            # exact) — sibling reduces of the stats pass over fp32 z,
            # which that pass materialises anyway: no extra HBM cost.
            rmax = jnp.max(z, axis=(1, 2))
            rmin = jnp.min(z, axis=(1, 2))
            if b is not None:
                bb = b.astype(jnp.float32)[None, :]
                rmax, rmin = rmax + bb, rmin + bb
        else:
            # no stats pass to join: reduce over the narrow `out` the
            # consumers read anyway (reducing z here would force a 4-byte
            # fp32 materialisation of the whole map — measured +GBs/fwd)
            rmax = jnp.max(out, axis=(1, 2)).astype(jnp.float32)
            rmin = jnp.min(out, axis=(1, 2)).astype(jnp.float32)
        ranges = jax.lax.stop_gradient(jnp.stack([rmax, rmin], axis=1))
    if not want_stats:
        return (out, ranges) if want_range else out
    # stats = (B, 2, Cout) = [sum(y), centered sumsq Q = sum((y - mean)^2)].
    # Q is shift-invariant, so it is computed from the PRE-bias output
    # whose per-channel means are small: the naive E[y^2] - E[y]^2 form
    # loses all precision in fp32 once a channel's |mean|/std exceeds
    # a few hundred (e.g. a drifting learned bias), which made GroupNorm
    # explode exactly where it matters most.
    npix = y.shape[1] * y.shape[2]
    s1z = jnp.sum(z, axis=(1, 2))
    s2z = jnp.sum(z * z, axis=(1, 2))
    q = s2z - s1z * s1z / npix
    s1 = s1z + (npix * b.astype(jnp.float32)[None, :] if b is not None else 0.0)
    stats = jnp.stack([s1, q], axis=1)  # (B, 2, Cout)
    return (out, stats, ranges) if want_range else (out, stats)


@functools.partial(
    jax.jit, static_argnames=("want_stats", "interpret", "th", "chunks")
)
def _pallas_conv3x3(
    x: Array,
    w: Array,
    b: Array,
    pro: Optional[Array],
    want_stats: bool,
    th: int,
    interpret: bool = False,
    chunks: int = 0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, wid, cin = x.shape
    cout = w.shape[-1]
    n_i = h // th

    w9 = w.reshape(9, cin, cout)
    b8 = jnp.zeros((8, cout), jnp.float32).at[0].set(b.astype(jnp.float32))
    with_pro = pro is not None
    if with_pro:
        pro8 = jnp.zeros((bsz, 8, cin), jnp.float32).at[:, :2].set(
            pro.astype(jnp.float32)
        )
    else:
        pro8 = jnp.zeros((bsz, 8, cin), jnp.float32)

    grid = (bsz, n_i)
    in_specs = [
        # full array, stays in HBM: the kernel DMAs its two halo rows
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((1, th, wid, cin), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, cout), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, cin), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((bsz, h, wid, cout), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, th, wid, cout), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if want_stats:
        out_shape.append(jax.ShapeDtypeStruct((bsz, 8, cout), jnp.float32))
        # constant over i -> the block stays resident and accumulates
        out_specs.append(
            pl.BlockSpec((1, 8, cout), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _kernel,
        th=th,
        with_prologue=with_pro,
        with_stats=want_stats,
        out_dtype=x.dtype,
        chunks=chunks,
    )
    if not want_stats:
        kernel = functools.partial(_no_stats_wrap, kernel)

    flops = 2 * bsz * h * wid * cout * 9 * cin
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shape if want_stats else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((2, wid, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=x.size if with_pro else 0,
        ),
    )(x, x, w9, b8, pro8)
    if want_stats:
        y, s = outs
        npix = x.shape[1] * x.shape[2]
        s1z, s2z = s[:, 0], s[:, 1]
        q = s2z - s1z * s1z / npix
        s1 = s1z + npix * b.astype(jnp.float32)[None, :]
        return y, jnp.stack([s1, q], axis=1)  # (B, 2, Cout)
    return outs


def _no_stats_wrap(kernel, x_hbm, x_ref, w_ref, b_ref, pro_ref, y_ref, halo, sem):
    kernel(x_hbm, x_ref, w_ref, b_ref, pro_ref, y_ref, None, halo, sem)


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def supported(
    x_shape: Tuple[int, ...], w_shape: Tuple[int, ...], chunks: int = 0
) -> bool:
    """Dispatch heuristic (measured on v5e): the kernel wins at large
    spatial extents where XLA's conv is im2col-read-bound; below 256²
    XLA's lowering is already near the floor, and narrow channel counts
    waste MXU lanes. For row-chunked inputs the gate applies to the
    IMAGE extent (chunks * rows * W)."""
    if len(x_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    import os

    min_pixels = int(os.environ.get("KDT_CONV3X3_MIN_PIXELS", 256 * 256))
    max_pixels = int(os.environ.get("KDT_CONV3X3_MAX_PIXELS", 1 << 62))
    _, h, w, cin = x_shape
    cout = w_shape[-1]
    img_pixels = h * w * max(chunks, 1)
    return (
        img_pixels >= min_pixels
        and img_pixels <= max_pixels
        and cin % _LANE == 0
        and cout % _LANE == 0
        and cin <= 512
        and _pick_th(h, w, cin, cout) is not None
    )


def _dispatch(
    x, w, b, pro, want_stats, chunks, xla_only, interpret, quant=False,
    a_max=None, want_range=False,
):
    import os

    # The Pallas kernel beats XLA's conv 1.5-2x in ISOLATION at every hot
    # shape, but inside the UNCHUNKED U-Net it loses ~25 ms/step to
    # XLA whole-model fusion/layout effects (see PERF.md "Fused conv3x3
    # kernel"), so it is opt-in (KDT_CONV3X3=pallas). Chunked-spatial
    # inputs dispatch under the same opt-in: the batch-of-chunks layout
    # is uniform across the graph (no space-to-batch copies to fuse
    # against), the integration regime round 2 measured does not apply
    # verbatim — measured separately (PERF.md round 3).
    if quant or want_range:  # int8 / range-epilogue paths are XLA-only
        return xla_conv3x3(
            x, w, b, pro, want_stats, chunks, quant=quant,
            a_max=a_max, want_range=want_range,
        )
    if xla_only or os.environ.get("KDT_CONV3X3", "xla") != "pallas":
        return xla_conv3x3(x, w, b, pro, want_stats, chunks)
    if interpret is None:
        if not on_tpu():
            return xla_conv3x3(x, w, b, pro, want_stats, chunks)
        interpret = False
    if b is None:
        b = jnp.zeros((w.shape[-1],), jnp.float32)
    th = _pick_th(x.shape[1], x.shape[2], x.shape[3], w.shape[-1])
    return _pallas_conv3x3(
        x, w, b, pro, want_stats, th, interpret=interpret, chunks=chunks
    )


# --- public entry points with XLA-recompute gradients ----------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _conv3x3_vjp(
    x, w, b, pro, a_max, want_stats, chunks, xla_only, quant=False,
    want_range=False,
):
    return _dispatch(
        x, w, b, pro, want_stats, chunks, xla_only, None, quant,
        a_max, want_range,
    )


def _fwd(
    x, w, b, pro, a_max, want_stats, chunks, xla_only, quant=False,
    want_range=False,
):
    return (
        _dispatch(
            x, w, b, pro, want_stats, chunks, xla_only, None, quant,
            a_max, want_range,
        ),
        (x, w, b, pro),
    )


def _bwd(want_stats, chunks, xla_only, quant, want_range, res, g):
    # quant: straight-through — the backward differentiates the exact
    # (non-quantized) reference; the int8 path is a serving-time mode.
    # Differentiate an all-fp32 reference: JAX's conv transpose rejects
    # the mixed bf16-operand / f32-cotangent pattern that
    # preferred_element_type creates, and the forward's f32 accumulation
    # makes the f32-operand gradient exact anyway (casting bf16 operands
    # up is lossless).
    x, w, b, pro = res
    diff = [x.astype(jnp.float32), w.astype(jnp.float32)]
    if b is not None:
        diff.append(b.astype(jnp.float32))
    if pro is not None:
        diff.append(pro.astype(jnp.float32))

    def ref(*args):
        it = iter(args)
        xx, ww = next(it), next(it)
        bb = next(it) if b is not None else None
        pp = next(it) if pro is not None else None
        # the exact reference never needs the range epilogue; its
        # outputs are stop_gradient'd anyway, so drop them from the
        # differentiated graph and from the cotangent structure
        return xla_conv3x3(xx, ww, bb, pp, want_stats, chunks)

    _, vjp = jax.vjp(ref, *diff)
    if want_range:  # strip the (zero) range cotangent
        g = g[:-1] if want_stats else g[0]
    g32 = jax.tree.map(lambda t: t.astype(jnp.float32), g)
    grads = list(vjp(g32))
    gx = grads[0].astype(x.dtype)
    gw = grads[1].astype(w.dtype)
    k = 2
    gb = grads[k].astype(b.dtype) if b is not None else None
    k += 1 if b is not None else 0
    gp = grads[k].astype(pro.dtype) if pro is not None else None
    return gx, gw, gb, gp, None  # a_max: no gradient (quant scale bound)


_conv3x3_vjp.defvjp(_fwd, _bwd)


def conv3x3(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    pro: Optional[Array] = None,
    want_stats: bool = False,
    chunks: int = 0,
    force_xla: bool = False,
    interpret: Optional[bool] = None,
    quant: bool = False,
    a_max: Optional[Array] = None,
    want_range: bool = False,
):
    """3x3 SAME conv over NHWC with optional fused affine+SiLU prologue
    (`pro`: (B, 2, Cin) = [a; c] applied as silu(x*a + c)) and per-channel
    per-channel [sum, centered-sumsq] stats of the output
    (`want_stats` -> extra (B, 2, Cout); variance-safe — see
    xla_conv3x3).

    chunks>0: row-chunked input (B*chunks, rows, W, Cin) — the conv runs
    VALID-H over halo-exchanged chunks (exact SAME semantics on the
    unchunked image); stats come back per-chunk. On the Pallas path the
    halo rows are DMA'd from the neighbour chunk directly (no padded
    copy); `pro`, if given, must be per-image-constant across a chunk
    group (gn_film_affine(chunks=...) guarantees this — the neighbour's
    edge row is prologue'd with THIS chunk's affine).

    Dispatches to the Pallas row-tiled kernel on TPU for supported
    shapes; XLA elsewhere. `interpret=True` forces the Pallas
    interpreter (kernel tests)."""
    if interpret is not None:
        assert not quant and not want_range, (
            "the Pallas interpreter path has no int8 / range-epilogue mode"
        )
        if b is None:
            b = jnp.zeros((w.shape[-1],), jnp.float32)
        th = _pick_th(x.shape[1], x.shape[2], x.shape[3], w.shape[-1])
        return _pallas_conv3x3(
            x, w, b, pro, want_stats, th, interpret=interpret, chunks=chunks
        )
    # everything routes through the custom VJP: the f32-accumulating
    # forward conv is not differentiable directly with bf16 operands
    # (JAX's conv transpose rejects the mixed-dtype pattern)
    xla_only = force_xla or not supported(x.shape, w.shape, chunks)
    return _conv3x3_vjp(
        x, w, b, pro, a_max, want_stats, chunks, xla_only, quant, want_range
    )
