"""Efficient U-Net for cascaded diffusion (Flax linen, NHWC, bf16 compute).

Covers the full configuration surface the reference exercises on
imagen-pytorch's `Unet` (see /root/reference/train.py:28-67,
train_ultra_res.py:27-62, train_kumar.py:27-53):

  dim, dim_mults, cond_dim, text_embed_dim, num_resnet_blocks (int or
  per-level tuple), layer_attns / layer_cross_attns (bool or tuple),
  memory_efficient, init_conv_to_final_conv_residual,
  cond_images_channels, lowres_cond.

Architecture notes (TPU-first, not a translation):
  * NHWC + space-to-depth downsampling: convs lower cleanly onto the MXU.
  * `memory_efficient=True` downsamples at the ENTRY of every level, so
    the deepest feature maps of the 1024² stage never materialise at
    full resolution (the reference relies on the same trick,
    /root/reference/train.py:47).
  * Conditioning: FiLM time conditioning in every resnet block; "text"
    tokens (the 3-float patient-metadata vector) + time tokens form the
    cross-attention context; classifier-free guidance uses learned null
    embeddings selected by a per-example drop mask.
  * Low-res conditioning (super-res stages): the upsampled coarse image
    is channel-concatenated and its augmentation-noise level embedded
    and added to the time conditioning (noise-conditioning augmentation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Conv3x3,
    CrossAttentionBlock,
    Downsample,
    FinalConv,
    ResnetBlock,
    SinusoidalPosEmb,
    TransformerBlock,
    Upsample,
    amax_from_ranges,
    dynamic_amax,
    ranges_enabled,
)

Array = jax.Array


def _per_level(value, num_levels: int) -> Tuple:
    if isinstance(value, (tuple, list)):
        assert len(value) == num_levels, f"{value} vs {num_levels} levels"
        return tuple(value)
    return (value,) * num_levels


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static configuration — hashable so jitted fns can close over it."""

    dim: int = 128
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    cond_dim: Optional[int] = None  # defaults to dim
    text_embed_dim: Optional[int] = None  # None => unconditional on text
    num_resnet_blocks: Union[int, Tuple[int, ...]] = 1
    layer_attns: Union[bool, Tuple[bool, ...]] = False
    layer_cross_attns: Union[bool, Tuple[bool, ...]] = False
    attn_heads: int = 8
    attn_dim_head: int = 64
    ff_mult: int = 2
    memory_efficient: bool = False
    init_conv_to_final_conv_residual: bool = False
    cond_images_channels: int = 0
    lowres_cond: bool = False
    num_time_tokens: int = 2
    groups: int = 8
    dtype: str = "bfloat16"  # compute dtype; params are always fp32
    remat: bool = False  # rematerialise resblocks (trade FLOPs for HBM
    # during training — lets the 1024² stage train without random crops
    # or at larger batch)
    spatial_chunks: int = 0  # >0: run the net on row-chunks of the image
    # (batch-of-chunks layout, explicit one-row halo exchange per conv).
    # Exact same function; avoids XLA's per-conv space-to-batch copies at
    # large spatial extents (~15% faster at 1024², PERF.md round 2).
    # Applied when H is divisible by spatial_chunks * 2**num_levels.
    quant_conv: Optional[str] = None  # "int8": w8a8 dynamic-symmetric
    # quantized serving path on the big spatial conv sites (weights
    # per-out-channel, activations per-tensor, quantized in-graph from
    # the bf16 params — same checkpoints). The MXU's int8 rate is 2x
    # bf16 on v5e; gated per-site by models.blocks._quant_site. A
    # serving-time quality/speed trade — training configs leave it None.
    storage_dtype: Optional[str] = None  # e.g. "float8_e4m3fn": STORE
    # inter-block activations and skip tensors in this dtype while all
    # compute stays in `dtype`. The converts fuse into the producing /
    # consuming convs, so every materialised feature map costs half the
    # HBM bytes — a throughput/precision trade for the bandwidth-bound
    # 1024² stage (measured in PERF.md round 3). None = exact bf16 path.
    # NOTE: narrowing the conv1->conv2 intra-block intermediate was
    # measured and REJECTED: XLA already keeps it virtual (recomputed
    # from the conv's int32/fp32 output into both the stats pass and the
    # consumer), so an explicit narrow cast ADDS a materialisation
    # (exact path 33.9 -> 37.0 GB/fwd; quant path byte-identical —
    # PERF.md round 3, cost_stage3.py KDT_COST_INTRA probe).

    @property
    def num_levels(self) -> int:
        return len(self.dim_mults)

    @property
    def resolved_cond_dim(self) -> int:
        return self.cond_dim or self.dim

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def param_count(self, params) -> int:
        return sum(p.size for p in jax.tree.leaves(params))


class EfficientUNet(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Array,
        *,
        text_embeds: Optional[Array] = None,
        cond_images: Optional[Array] = None,
        lowres_cond_img: Optional[Array] = None,
        lowres_noise_times: Optional[Array] = None,
        cond_drop_mask: Optional[Array] = None,
    ) -> Array:
        cfg = self.config
        dt = cfg.compute_dtype
        qt = cfg.quant_conv == "int8"  # w8a8 serving path (gated per-site)
        b, h_in, w_in, _ = x.shape

        num_levels = cfg.num_levels
        dims = tuple(cfg.dim * m for m in cfg.dim_mults)
        ResBlock = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        blocks_per = _per_level(cfg.num_resnet_blocks, num_levels)
        attns_per = _per_level(cfg.layer_attns, num_levels)
        cross_per = _per_level(cfg.layer_cross_attns, num_levels)
        time_cond_dim = cfg.dim * 4
        cond_dim = cfg.resolved_cond_dim

        # ---- assemble input channels -------------------------------------
        parts = [x.astype(dt)]
        if cfg.lowres_cond:
            assert lowres_cond_img is not None, "stage configured with lowres_cond"
            parts.append(lowres_cond_img.astype(dt))
        if cfg.cond_images_channels:
            assert cond_images is not None, (
                f"model expects {cfg.cond_images_channels} cond_image channels"
            )
            if cond_images.shape[1] != h_in or cond_images.shape[2] != w_in:
                cond_images = jax.image.resize(
                    cond_images,
                    (b, h_in, w_in, cond_images.shape[-1]),
                    method="nearest",
                )
            parts.append(cond_images.astype(dt))
        x = jnp.concatenate(parts, axis=-1)

        # ---- time conditioning --------------------------------------------
        t_hidden = SinusoidalPosEmb(cfg.dim, name="time_pos_emb")(time)
        t_hidden = nn.silu(nn.Dense(time_cond_dim, dtype=jnp.float32, name="time_mlp")(t_hidden))
        t_cond = nn.Dense(time_cond_dim, dtype=jnp.float32, name="to_time_cond")(t_hidden)
        time_tokens = nn.Dense(
            cond_dim * cfg.num_time_tokens, dtype=jnp.float32, name="to_time_tokens"
        )(t_hidden).reshape(b, cfg.num_time_tokens, cond_dim)

        if cfg.lowres_cond:
            if lowres_noise_times is None:
                lowres_noise_times = jnp.zeros((b,), jnp.float32)
            lr_hidden = SinusoidalPosEmb(cfg.dim, name="lowres_time_pos_emb")(lowres_noise_times)
            lr_hidden = nn.silu(
                nn.Dense(time_cond_dim, dtype=jnp.float32, name="lowres_time_mlp")(lr_hidden)
            )
            t_cond = t_cond + nn.Dense(
                time_cond_dim, dtype=jnp.float32, name="lowres_to_time_cond"
            )(lr_hidden)
            lr_tokens = nn.Dense(
                cond_dim * cfg.num_time_tokens, dtype=jnp.float32, name="lowres_to_time_tokens"
            )(lr_hidden).reshape(b, cfg.num_time_tokens, cond_dim)
            time_tokens = jnp.concatenate([time_tokens, lr_tokens], axis=1)

        # ---- text ("metadata vector") conditioning with CFG null tokens ----
        context = time_tokens
        if cfg.text_embed_dim is not None and text_embeds is not None:
            n_tok = text_embeds.shape[1]
            text_tokens = nn.Dense(cond_dim, dtype=jnp.float32, name="text_to_cond")(
                text_embeds.astype(jnp.float32)
            )
            null_token = self.param(
                "null_text_token", nn.initializers.normal(0.02), (1, 1, cond_dim)
            )
            null_pooled = self.param(
                "null_text_pooled", nn.initializers.normal(0.02), (1, time_cond_dim)
            )
            pooled = jnp.mean(text_tokens, axis=1)
            pooled = nn.silu(
                nn.Dense(time_cond_dim, dtype=jnp.float32, name="text_pool_proj")(pooled)
            )
            if cond_drop_mask is not None:
                keep = (1.0 - cond_drop_mask.astype(jnp.float32))[:, None, None]
                text_tokens = text_tokens * keep + null_token * (1.0 - keep)
                pooled = pooled * keep[:, :, 0] + null_pooled * (1.0 - keep[:, :, 0])
            t_cond = t_cond + pooled
            context = jnp.concatenate([time_tokens, text_tokens], axis=1)

        context = context.astype(dt)

        # ---- spatial chunking (batch-of-row-chunks layout) -----------------
        ch = cfg.spatial_chunks
        if ch and (h_in % (ch * 2 ** num_levels) != 0 or h_in // ch < 2):
            ch = 0  # shape not chunkable (e.g. tiny test inputs)
        if ch:
            x = x.reshape(b * ch, h_in // ch, w_in, x.shape[-1])

        def unchunked(y):
            y = y.astype(dt)  # attention blocks compute from the wide dtype
            return y.reshape(b, y.shape[1] * ch, *y.shape[2:]) if ch else y

        def rechunked(y):
            return y.reshape(b * ch, y.shape[1] // ch, *y.shape[2:]) if ch else y

        sdt = jnp.dtype(cfg.storage_dtype) if cfg.storage_dtype else None
        # range propagation (w8a8 serving): thread a bound on each
        # tensor's amax alongside it so every int8 conv's scale is a
        # precomputed scalar — no per-conv amax reduction passes (see
        # kernels.conv3x3 `a_max` / models.blocks range helpers). `xa` is
        # None wherever the bound is unknown (conv falls back to its
        # dynamic amax); untracked producers (plain-conv downsamples,
        # attention residuals) re-anchor with one cheap reduction.
        track = qt and ranges_enabled()
        # narrow storage rounds half-ulp either way; inflate carried
        # bounds so they stay true bounds on the stored tensor
        sf = 1.0 + 2.0 ** -(jnp.finfo(sdt).nmant) if sdt is not None else 1.0

        def store(y, ya=None):
            """Narrow-dtype storage of a block-boundary feature map
            (+ its carried amax bound)."""
            if sdt is None:
                return (y, ya) if track else y
            y = y.astype(sdt)
            if not track:
                return y
            return y, (None if ya is None else ya * sf)

        def reanchor(y):
            """Exact amax of an untracked (already-stored) tensor."""
            return dynamic_amax(y) if track else None

        # ---- init conv -----------------------------------------------------
        xa = None
        if ch:
            if track:
                x, r = Conv3x3(cfg.dim, dt, ch, qt, name="init_conv")(
                    x, want_range=True
                )
                xa = amax_from_ranges(r)
            else:
                x = Conv3x3(cfg.dim, dt, ch, qt, name="init_conv")(x)
        else:
            x = nn.Conv(cfg.dim, (3, 3), dtype=dt, name="init_conv")(x)
            xa = reanchor(x)
        if track:
            x, xa = store(x, xa)
        else:
            x = store(x)
        init_conv_out, init_a = x, xa

        def res_block(name, d, x, xa):
            blk = ResBlock(d, cfg.groups, dt, ch, qt, name=name)
            if track:
                x, xa = blk(x, t_cond, xa)
                return store(x, xa)
            return store(blk(x, t_cond)), None

        def attn_block(mod, x):
            x = rechunked(mod(unchunked(x), context))
            if track:
                x, _ = store(x, None)
                return x, reanchor(x)
            return store(x), None

        # ---- down path -------------------------------------------------------
        skips = []
        for i in range(num_levels):
            d = dims[i]
            if cfg.memory_efficient:
                x = Downsample(d, dt, name=f"down{i}_pre")(x)
                if track:
                    x, _ = store(x, None)
                    xa = reanchor(x)
                else:
                    x = store(x)
            x, xa = res_block(f"down{i}_block0", d, x, xa)
            if cross_per[i]:
                x, xa = attn_block(CrossAttentionBlock(
                    cfg.attn_heads, cfg.attn_dim_head, dt, name=f"down{i}_cross"
                ), x)
            skips.append((x, xa))
            for j in range(blocks_per[i]):
                x, xa = res_block(f"down{i}_block{j + 1}", d, x, xa)
                skips.append((x, xa))
            if attns_per[i]:
                x, xa = attn_block(TransformerBlock(
                    cfg.attn_heads, cfg.attn_dim_head, cfg.ff_mult, dt, name=f"down{i}_attn"
                ), x)
            if not cfg.memory_efficient and i < num_levels - 1:
                x = Downsample(dims[i + 1], dt, name=f"down{i}_post")(x)
                if track:
                    x, _ = store(x, None)
                    xa = reanchor(x)
                else:
                    x = store(x)

        # ---- middle ----------------------------------------------------------
        x, xa = res_block("mid_block1", dims[-1], x, xa)
        if cross_per[-1]:
            x, xa = attn_block(CrossAttentionBlock(
                cfg.attn_heads, cfg.attn_dim_head, dt, name="mid_cross"
            ), x)
        if attns_per[-1]:
            x, xa = attn_block(TransformerBlock(
                cfg.attn_heads, cfg.attn_dim_head, cfg.ff_mult, dt, name="mid_attn"
            ), x)
        x, xa = res_block("mid_block2", dims[-1], x, xa)

        # ---- up path -----------------------------------------------------------
        for i in reversed(range(num_levels)):
            d = dims[i]
            for j in range(blocks_per[i] + 1):
                skip, ska = skips.pop()
                if track:
                    x, xa = store(x, xa)
                    xa = jnp.maximum(xa, ska) if xa is not None and ska is not None else None
                else:
                    x = store(x)
                x = jnp.concatenate([x, skip], axis=-1)
                x, xa = res_block(f"up{i}_block{j}", d, x, xa)
            if cross_per[i]:
                x, xa = attn_block(CrossAttentionBlock(
                    cfg.attn_heads, cfg.attn_dim_head, dt, name=f"up{i}_cross"
                ), x)
            if attns_per[i]:
                x, xa = attn_block(TransformerBlock(
                    cfg.attn_heads, cfg.attn_dim_head, cfg.ff_mult, dt, name=f"up{i}_attn"
                ), x)
            if cfg.memory_efficient or i > 0:
                up_dim = (dims[i - 1] if i > 0 else cfg.dim) if cfg.memory_efficient else dims[i - 1]
                up = Upsample(up_dim, dt, ch, qt, name=f"up{i}_upsample")
                if track:
                    x, xa = up(x, xa)
                    x, xa = store(x, xa)
                else:
                    x = store(up(x))

        assert not skips, "skip connection mismatch"

        # ---- final -----------------------------------------------------------
        if cfg.init_conv_to_final_conv_residual:
            if track:
                x, xa = store(x, xa)
                xa = jnp.maximum(xa, init_a) if xa is not None and init_a is not None else None
            else:
                x = store(x)
            x = jnp.concatenate([x, init_conv_out], axis=-1)
        fb = ResBlock(cfg.dim, cfg.groups, dt, ch, qt, name="final_block")
        x = fb(x, t_cond, xa)[0] if track else fb(x, t_cond)
        # bf16 operands + fp32 accumulation: an fp32-dtype conv made XLA
        # materialise an fp32 copy of the full-res 128-channel input as
        # the conv operand and run the MXU at the fp32 rate, for values
        # that are bf16-precision already (and an output that was cast
        # to bf16 right after). Param tree unchanged (kernel/bias).
        out = FinalConv(cfg.channels, dtype=dt, chunks=ch, name="final_conv")(x)
        return unchunked(out)


class NullUNet:
    """Identity placeholder for cascade stages not owned by this process.

    Mirrors the reference's `FixedNullUnet` pattern
    (/root/reference/train.py:70-80): an Imagen-like cascade object can
    describe all stages while only stage k has real parameters.
    """

    def __init__(self, lowres_cond: bool = False):
        self.lowres_cond = lowres_cond

    def init(self, *args, **kwargs):
        return {}

    def apply(self, params, x, *args, **kwargs):
        return x
