"""Building blocks for the efficient U-Net (Flax linen, NHWC).

TPU-first choices:
  * NHWC everywhere — XLA:TPU's native conv layout.
  * Space-to-depth + 1x1 conv downsampling (becomes an MXU matmul) instead
    of strided conv.
  * Compute dtype (bf16) is a parameter of every block; params stay fp32.
  * Attention is plain batched einsum here; the Pallas fused kernel in
    kernels/attention.py is substituted at the call site when profitable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class SinusoidalPosEmb(nn.Module):
    """Sinusoidal embedding of continuous diffusion time.

    Times are in [0, 1]; they are scaled by 1000 internally so the
    embedding resolves fine-grained time differences.
    """

    dim: int

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        freqs = jnp.exp(
            -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
        )
        args = t.astype(jnp.float32)[:, None] * 1000.0 * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _quant_site(shape, cout: int, chunks: int) -> bool:
    """Should this conv site run the w8a8 int8 path? Gate by the FULL
    image extent and channel width (the 3-channel output conv would put
    rounding noise straight into the image). The shipped threshold is
    64² — the in-model sweep (PERF.md round 3) shows int8 keeps winning
    down through every flagship level (63.9 ms vs 71.6 at a 256² gate),
    unlike the isolated micro-bench which predicted a loss below 256²."""
    import os

    min_pix = int(os.environ.get("KDT_QUANT_MIN_PIX", 64 * 64))
    min_ch = int(os.environ.get("KDT_QUANT_MIN_CH", 32))
    _, h, w, cin = shape
    return h * w * max(chunks, 1) >= min_pix and cin >= min_ch and cout >= min_ch


class Conv3x3(nn.Module):
    """Param-compatible replacement for `nn.Conv(features, (3, 3))`
    (same param names/shapes/inits) that computes through
    kernels.conv3x3 — the Pallas row-tiled kernel on TPU for the
    super-res hot shapes, XLA elsewhere. Supports the kernel's fused
    affine+SiLU prologue and GroupNorm-stats epilogue. `quant` opts the
    site into the w8a8 int8 serving path (applied only where
    `_quant_site` says the int8 MXU rate wins); `a_max` is a precomputed
    bound on the conv input's amax (post-prologue) so the int8 scale
    needs no reduction over the activation, and `want_range` adds the
    per-channel [max, min] output epilogue both of which feed the range
    propagation in EfficientUNet (see kernels.conv3x3)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 0  # >0: row-chunked input, halo-exchanged VALID conv
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        pro: Optional[Array] = None,
        want_stats: bool = False,
        a_max: Optional[Array] = None,
        want_range: bool = False,
    ):
        from ..kernels.conv3x3 import conv3x3

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv3x3(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias,
            pro=pro,
            want_stats=want_stats,
            chunks=self.chunks,
            quant=self.quant
            and _quant_site(x.shape, self.features, self.chunks),
            a_max=a_max,
            want_range=want_range,
        )


class GroupNormParams(nn.Module):
    """Owns `nn.GroupNorm`-compatible params (scale/bias); the normalize
    itself happens in `gn_film_affine` / fused into the next conv."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return scale, bias


def gn_film_affine(
    stats: Array,
    npix: int,
    gamma: Array,
    beta: Array,
    scale_shift=None,
    groups: int = 8,
    eps: float = 1e-6,
    chunks: int = 0,
) -> Array:
    """Fold GroupNorm-apply (+ optional FiLM) into a per-(batch, channel)
    affine: silu(y*A + C) == silu(FiLM(GN(y))). `stats` is the conv
    kernel's (B, 2, C) per-channel [sum, centered-sumsq Q] over npix
    pixels (kernels/conv3x3.py). Group moments come from the exact
    decomposition var_g = mean_c(var_c) + mean_c((mu_c - mu_g)^2) —
    no large-mean cancellation (the naive E[y^2]-E[y]^2 group form
    loses fp32 precision once |mean|/std reaches a few hundred).

    chunks>0: stats are per-row-chunk (B*chunks, 2, C) over npix pixels
    EACH; they combine per image via the parallel-variance rule
    (Q = sum_i Q_i + n_i * sum_i (mu_i - mu)^2 — exact GroupNorm over
    the full map) and the affine is repeated back to (B*chunks, 2, C)."""
    if chunks:
        bc = stats.shape[0]
        st = stats.reshape(bc // chunks, chunks, 2, -1)
        s1_i, q_i = st[:, :, 0], st[:, :, 1]  # (B, CH, C)
        s1 = s1_i.sum(1)
        mu_i = s1_i / npix
        mu_tot = s1 / (npix * chunks)
        q = q_i.sum(1) + npix * jnp.sum((mu_i - mu_tot[:, None]) ** 2, axis=1)
        stats = jnp.stack([s1, q], axis=1)
        npix = npix * chunks
    b, _, c = stats.shape
    cpg = c // groups
    mu_c = stats[:, 0] / npix          # (B, C) per-channel mean
    var_c = stats[:, 1] / npix         # (B, C) per-channel variance
    mu_g = mu_c.reshape(b, groups, cpg).mean(-1)   # (B, G)
    spread = ((mu_c.reshape(b, groups, cpg) - mu_g[:, :, None]) ** 2).mean(-1)
    var = var_c.reshape(b, groups, cpg).mean(-1) + spread
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)  # (B, G)

    def per_channel(g):  # (B, G) -> (B, C)
        return jnp.broadcast_to(g[:, :, None], (b, groups, cpg)).reshape(b, c)

    mu_bc, rstd_c = per_channel(mu_g), per_channel(rstd)
    gamma = gamma.astype(jnp.float32)[None, :]
    beta = beta.astype(jnp.float32)[None, :]
    a = gamma * rstd_c
    cc = beta - mu_bc * rstd_c * gamma
    if scale_shift is not None:
        scale, shift = scale_shift
        scale = scale.astype(jnp.float32) + 1.0
        a = a * scale
        cc = cc * scale + shift.astype(jnp.float32)
    out = jnp.stack([a, cc], axis=1)  # (B, 2, C)
    if chunks:
        out = jnp.repeat(out, chunks, axis=0)  # back to per-chunk batch
    return out


def ranges_enabled() -> bool:
    """Range-propagated quantization scales (default). KDT_QUANT_RANGES=0
    falls back to per-conv dynamic amax reductions — the A/B escape
    hatch (dynamic costs ~5 GB/fwd of extra HBM passes on the flagship
    stage 3, cost_stage3.py)."""
    import os

    return os.environ.get("KDT_QUANT_RANGES", "1") != "0"


# |silu| on (-inf, 0] is bounded by |silu(-1.2785)| = 0.2785; silu is
# monotone on either side of that single interior minimum, so the max of
# |silu| over z <= zhi is max(silu(zhi), 0.2785).
_SILU_NEG_BOUND = 0.2785
# ranges are reduced in fp32, but the tensors they bound round through
# the bf16 compute dtype (and elementwise chains round twice: e.g. the
# deferred affine+silu) — inflate every produced bound past two bf16
# half-ulps so it stays a TRUE bound on the rounded values
_ROUND = 1.0 + 2.0**-7


def amax_from_ranges(ranges: Array) -> Array:
    """Per-tensor amax bound (fp32 scalar) from a conv range epilogue's
    per-channel [max, min] — (B[*chunks], 2, C) from kernels.conv3x3.
    Exact up to the compute-dtype rounding allowance."""
    return _ROUND * jnp.max(
        jnp.maximum(jnp.abs(ranges[:, 0]), jnp.abs(ranges[:, 1]))
    ).astype(jnp.float32)


def silu_affine_amax(affine: Array, ranges: Array) -> Array:
    """Bound (fp32 scalar) on max|silu(a*y + c)| given the affine
    (B[*chunks], 2, C) and y's per-channel [max, min] ranges — the exact
    range of the deferred GroupNorm+FiLM+SiLU activation that the next
    conv consumes. Tight to within the silu negative-lobe constant and
    the compute-dtype rounding allowance."""
    a, c = affine[:, 0], affine[:, 1]
    zhi = jnp.maximum(a * ranges[:, 0], a * ranges[:, 1]) + c
    return _ROUND * jnp.maximum(
        jnp.max(jax.nn.silu(zhi)), _SILU_NEG_BOUND
    ).astype(jnp.float32)


def dynamic_amax(x: Array) -> Array:
    """Per-tensor amax (fp32 scalar), reduced in the input dtype. Used
    at range-propagation re-anchor points (producers without a range
    epilogue: plain-conv downsamples, attention residuals) — a cheap
    1-2 byte pass over tensors far smaller than the per-conv activations
    the propagated bounds make reduction-free."""
    return jnp.max(jnp.abs(x)).astype(jnp.float32)


class FinalConv(nn.Module):
    """Output 3x3 conv: bf16 operands, fp32 accumulation.

    Param-compatible with an `nn.Conv(dtype=float32)` (same kernel/bias
    names/shapes, zeros kernel init) but reads the full-res input in the
    compute dtype: an fp32-dtype conv makes XLA materialise an fp32 copy
    of the 1024²x128 operand as the conv input and pay the fp32 MXU
    rate, for operand values that already round through bf16 upstream
    (the model output was cast to bf16 afterwards anyway). Computes
    through kernels.conv3x3 — fp32 accumulation via
    preferred_element_type and the custom VJP that makes the
    bf16-operand conv differentiable (chunked inputs halo-exchange
    inside the kernel)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..kernels.conv3x3 import conv3x3

        kernel = self.param(
            "kernel", nn.initializers.zeros, (3, 3, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv3x3(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias,
            chunks=self.chunks,
            force_xla=True,
        )


class Downsample(nn.Module):
    """2x downsample: 2x2 stride-2 conv.

    Mathematically identical to space-to-depth + 1x1 conv (the kernel is
    the same weights indexed (dy, dx, c) instead of (1, 1, 4c)), but
    XLA:TPU lowers the strided conv natively without materialising the
    s2d transpose — measured 1.1 ms faster at 1024²x128."""

    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.dim_out, (2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)


class Upsample(nn.Module):
    """2x upsample: nearest-neighbour + 3x3 conv.

    The broadcast+reshape nearest-neighbour fuses into the conv's input
    inside the whole-model XLA program. A mathematically-exact subpixel
    rewrite (per-phase 2x2 convs at low res, 2.25x fewer FLOPs) wins
    3.5 ms in isolation at 512->1024x128 but LOSES ~6 ms in-model — the
    phase interleave materialises what the broadcast form never does
    (measured both ways, PERF.md round-2 notes)."""

    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 0
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array, a_max: Optional[Array] = None):
        b, h, w, c = x.shape
        # nearest x2 as broadcast+reshape (fuses; avoids gather-based
        # repeat). Row-chunked inputs upsample chunk-locally (rows are an
        # exact partition of the image) and convolve with halo exchange.
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        track = self.quant and ranges_enabled()
        if not track:
            return Conv3x3(
                self.dim_out, self.dtype, self.chunks, self.quant, name="proj"
            )(x)
        # nearest-neighbour preserves amax exactly, so the input bound
        # carries through; the proj's range epilogue re-anchors the
        # propagated bound exactly for downstream consumers
        out, ranges = Conv3x3(
            self.dim_out, self.dtype, self.chunks, self.quant, name="proj"
        )(x, a_max=a_max, want_range=True)
        return out, amax_from_ranges(ranges)


class Block(nn.Module):
    """3x3 conv -> GroupNorm -> (FiLM scale/shift) -> SiLU.

    The GroupNorm is computed from the conv kernel's fused
    [sum, centered-sumsq] stats epilogue and folded (with FiLM) to a
    per-(batch, channel) affine.
    With `defer=True` the affine is returned instead of applied, so the
    caller can fuse it into the NEXT conv's prologue (the normalized map
    never round-trips through HBM). `pro` is such a deferred affine for
    THIS block's conv input."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 0
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        scale_shift=None,
        *,
        pro: Optional[Array] = None,
        defer: bool = False,
        a_max: Optional[Array] = None,
    ):
        """`a_max` bounds this conv's (post-prologue) input amax; in
        quant mode the return value additionally carries the bound on
        THIS block's activation output — exact range propagation with no
        activation-sized reductions (see kernels.conv3x3 `a_max`)."""
        track = self.quant and ranges_enabled()
        conv = Conv3x3(
            self.dim_out, self.dtype, self.chunks, self.quant, name="conv"
        )
        if track:
            y, stats, ranges = conv(
                x, pro=pro, want_stats=True, a_max=a_max, want_range=True
            )
        else:
            y, stats = conv(x, pro=pro, want_stats=True)
        gamma, beta = GroupNormParams(name="norm")(self.dim_out)
        affine = gn_film_affine(
            stats, y.shape[1] * y.shape[2], gamma, beta, scale_shift,
            self.groups, chunks=self.chunks,
        )
        out_amax = silu_affine_amax(affine, ranges) if track else None
        if defer:
            return (y, affine, out_amax) if track else (y, affine)
        a = affine[:, 0][:, None, None, :]
        c = affine[:, 1][:, None, None, :]
        out = nn.silu(y.astype(jnp.float32) * a + c).astype(y.dtype)
        return (out, out_amax) if track else out


class ResnetBlock(nn.Module):
    """Two conv blocks with FiLM time conditioning and a residual path.

    block1's GroupNorm+FiLM+SiLU is deferred into block2's conv prologue
    (one fused kernel instead of conv + reduction + elementwise passes)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.bfloat16
    chunks: int = 0
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        time_emb: Optional[Array] = None,
        a_max: Optional[Array] = None,
    ):
        """In quant mode returns (out, out_amax): `a_max` bounds the
        input's amax and `out_amax` bounds the output's — block1's scale
        comes from the input bound, block2's from block1's exact
        silu-affine range, and the residual add bounds subadditively
        (|h + res|max <= |h|max + |res|max)."""
        track = self.quant and ranges_enabled()
        x = x.astype(self.dtype)  # inputs may arrive in a narrow storage
        # dtype (UNetConfig.storage_dtype); the cast fuses into our reads
        scale_shift = None
        if time_emb is not None:
            # per-image conditioning even in chunked form: gn_film_affine
            # folds it in at the aggregated (per-image) level
            emb = nn.silu(time_emb.astype(jnp.float32))
            emb = nn.Dense(self.dim_out * 2, dtype=jnp.float32, name="time_proj")(emb)
            scale_shift = jnp.split(emb, 2, axis=-1)

        block1 = Block(
            self.dim_out, self.groups, self.dtype, self.chunks, self.quant,
            name="block1",
        )
        block2 = Block(
            self.dim_out, self.groups, self.dtype, self.chunks, self.quant,
            name="block2",
        )
        if track:
            if a_max is None:  # untracked producer: one cheap reduction
                a_max = dynamic_amax(x)
            y1, pro1, a1 = block1(x, scale_shift, defer=True, a_max=a_max)
            h, ah = block2(y1, pro=pro1, a_max=a1)
        else:
            y1, pro1 = block1(x, scale_shift, defer=True)
            h = block2(y1, pro=pro1)

        if x.shape[-1] != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_proj")(x)
            ares = dynamic_amax(res) if track else None
        else:
            res, ares = x, a_max
        if not track:
            return h + res
        # subadditive bound on the residual add, + rounding allowance
        return h + res, _ROUND * (ah + ares)


def _attention(q: Array, k: Array, v: Array, dtype) -> Array:
    """Scaled dot-product attention over (B, N, H, D) tensors.

    Dispatches to the Pallas fused kernel on TPU (keeps the score matrix
    in VMEM); XLA einsum elsewhere (kernels/attention.py)."""
    from ..kernels.attention import attention

    return attention(q, k, v).astype(dtype)


class SelfAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        """x: (B, N, C). Optional `context` tokens are appended to k/v
        (imagen-style hybrid self+cross attention)."""
        b, n, c = x.shape
        inner = self.heads * self.dim_head
        normed = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(normed)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(normed)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(normed)
        m = n
        if context is not None:
            # context tokens live in cond_dim space; project them with their
            # own heads and append to the k/v sequences
            ctx = nn.LayerNorm(dtype=jnp.float32, name="ctx_norm")(context).astype(self.dtype)
            ck = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="ctx_to_k")(ctx)
            cv = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="ctx_to_v")(ctx)
            k = jnp.concatenate([k, ck], axis=1)
            v = jnp.concatenate([v, cv], axis=1)
            m = n + context.shape[1]

        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        out = _attention(q, k, v, self.dtype).reshape(b, n, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class CrossAttention(nn.Module):
    """Pixels attend to conditioning tokens (time tokens + text tokens)."""

    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, n, c = x.shape
        m = context.shape[1]
        inner = self.heads * self.dim_head
        normed = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        ctx = nn.LayerNorm(dtype=jnp.float32, name="ctx_norm")(context).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(normed)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        out = _attention(q, k, v, self.dtype).reshape(b, n, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    mult: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        h = nn.Dense(dim * self.mult, dtype=self.dtype, name="in")(h)
        h = nn.gelu(h)
        return nn.Dense(dim, dtype=self.dtype, name="out")(h)


class TransformerBlock(nn.Module):
    """Self-attention (+optional context) followed by a feed-forward, on a
    spatial feature map."""

    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = seq + SelfAttention(self.heads, self.dim_head, self.dtype, name="attn")(
            seq, context
        )
        seq = seq + FeedForward(self.ff_mult, self.dtype, name="ff")(seq)
        return seq.reshape(b, h, w, c)


class CrossAttentionBlock(nn.Module):
    """Residual cross-attention applied to a spatial feature map."""

    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = seq + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn")(
            seq, context
        )
        return seq.reshape(b, h, w, c)
