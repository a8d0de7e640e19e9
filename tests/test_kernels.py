import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kidney_diffusion_tpu.kernels.attention import attention, xla_attention


def _qkv(b=2, nq=2048, nk=2048, h=2, d=64, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, nq, h, d), dtype)
    k = jax.random.normal(ks[1], (b, nk, h, d), dtype)
    v = jax.random.normal(ks[2], (b, nk, h, d), dtype)
    return q, k, v


def test_pallas_matches_xla_self_attention():
    q, k, v = _qkv()
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_matches_xla_with_context_tokens():
    # keys longer than queries and NOT lane-aligned (4099 = 4096 + 3 ctx)
    q, k, v = _qkv(b=1, nq=2048, nk=2051, h=2)
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_unaligned_queries():
    q, k, v = _qkv(b=1, nq=2100, nk=2100, h=1)
    # nq < 128 block multiple -> padded internally
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_small_shapes_fall_back_to_xla():
    q, k, v = _qkv(b=1, nq=64, nk=64, h=2, d=32)
    got = attention(q, k, v)  # nq < BQ -> xla path, must not crash
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bf16_inputs():
    q, k, v = _qkv(dtype=jnp.bfloat16)
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


# --- fused 3x3 conv (kernels/conv3x3.py) -----------------------------------

from kidney_diffusion_tpu.kernels import conv3x3 as c3


def _conv_inputs(b=1, h=16, w=256, cin=128, cout=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    return x, wk, bias


def test_conv3x3_matches_xla():
    x, w, b = _conv_inputs()
    ref = c3.xla_conv3x3(x, w, b)
    got = c3.conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_conv3x3_matches_flax_conv():
    from flax import linen as nn

    x, w, b = _conv_inputs(b=2, h=8, w=256)
    conv = nn.Conv(128, (3, 3))
    ref = conv.apply({"params": {"kernel": w, "bias": b}}, x)
    got = c3.conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_conv3x3_prologue_and_stats():
    x, w, b = _conv_inputs(b=2, h=8, w=256)
    rng = np.random.default_rng(1)
    pro = jnp.asarray(rng.normal(size=(2, 2, 128)), jnp.float32)
    ry, rs = c3.xla_conv3x3(x, w, b, pro, want_stats=True)
    gy, gs = c3.conv3x3(x, w, b, pro=pro, want_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry), atol=1e-3)
    rel = np.max(np.abs(np.asarray(gs) - np.asarray(rs))) / (
        np.max(np.abs(np.asarray(rs))) + 1e-9
    )
    assert rel < 1e-5, rel


def test_conv3x3_boundary_rows_zero_padded():
    # single-row tiles exercise every halo/clamp branch
    x, w, b = _conv_inputs(b=1, h=4, w=512, cin=128, cout=128)
    ref = c3.xla_conv3x3(x, w, b)
    got = c3.conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_conv3x3_gradients_match_xla():
    x, w, b = _conv_inputs(b=1, h=8, w=128, cin=128, cout=128)
    pro = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 128)), jnp.float32)

    def loss_fused(x, w, b, pro):
        y, s = c3.conv3x3(x, w, b, pro=pro, want_stats=True)
        return jnp.sum(y**2) + jnp.sum(s**2) * 1e-6

    def loss_ref(x, w, b, pro):
        y, s = c3.xla_conv3x3(x, w, b, pro, want_stats=True)
        return jnp.sum(y**2) + jnp.sum(s**2) * 1e-6

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, pro)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, pro)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)


def test_conv3x3_dispatch_gating():
    # small maps and narrow channels fall back to XLA
    assert not c3.supported((1, 64, 64, 128), (3, 3, 128, 128))
    assert not c3.supported((1, 512, 512, 96), (3, 3, 96, 128))
    assert not c3.supported((1, 128, 128, 1024), (3, 3, 1024, 1024))
    assert c3.supported((1, 1024, 1024, 128), (3, 3, 128, 128))
    assert c3.supported((1, 512, 512, 256), (3, 3, 256, 128))


def test_fused_block_matches_unfused_semantics():
    """ResnetBlock's deferred-GN path == explicit conv->GN->FiLM->SiLU."""
    from flax import linen as nn

    from kidney_diffusion_tpu.models.blocks import ResnetBlock

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(2, 64)), jnp.float32)
    rb = ResnetBlock(32, groups=8, dtype=jnp.float32)
    params = rb.init(jax.random.PRNGKey(0), x, temb)
    out = rb.apply(params, x, temb)

    # reference semantics from the same params
    p = params["params"]
    emb = nn.silu(temb)
    emb = emb @ p["time_proj"]["kernel"] + p["time_proj"]["bias"]
    scale, shift = np.split(np.asarray(emb), 2, axis=-1)

    def block(x, bp, scale_shift=None):
        conv = nn.Conv(32, (3, 3))
        y = conv.apply({"params": bp["conv"]}, x)
        gn = nn.GroupNorm(num_groups=8)
        y = gn.apply({"params": bp["norm"]}, y)
        if scale_shift is not None:
            y = y * (scale_shift[0][:, None, None, :] + 1.0) + scale_shift[1][
                :, None, None, :
            ]
        return nn.silu(y)

    h = block(x, p["block1"], (jnp.asarray(scale), jnp.asarray(shift)))
    h = block(h, p["block2"])
    ref = h + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestChunkedConv:
    """Row-chunked (batch-of-chunks) conv path: exact SAME-conv parity."""

    def test_halo_pad(self):
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import halo_pad

        # 1 image, 3 chunks of 2 rows, W=1, C=1: rows numbered 0..5
        x = jnp.arange(6.0).reshape(3, 2, 1, 1)
        out = np.asarray(halo_pad(x, 3))[:, :, 0, 0]
        np.testing.assert_array_equal(
            out, [[0, 0, 1, 2], [1, 2, 3, 4], [3, 4, 5, 0]]
        )

    def test_halo_pad_multi_image(self):
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import halo_pad

        # 2 images x 2 chunks: halos must NOT leak across images
        x = jnp.arange(8.0).reshape(4, 2, 1, 1)
        out = np.asarray(halo_pad(x, 2))[:, :, 0, 0]
        np.testing.assert_array_equal(
            out, [[0, 0, 1, 2], [1, 2, 3, 0], [0, 4, 5, 6], [5, 6, 7, 0]]
        )

    def test_chunked_conv_equals_same_conv(self):
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import conv3x3

        rng = np.random.RandomState(0)
        B, H, W, C, D, CH = 2, 16, 12, 8, 6, 4
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, C, D).astype(np.float32))
        b = jnp.asarray(rng.randn(D).astype(np.float32))

        y_ref, s_ref = conv3x3(x, w, b, want_stats=True)
        xc = x.reshape(B * CH, H // CH, W, C)
        y_ch, s_ch = conv3x3(xc, w, b, want_stats=True, chunks=CH)

        np.testing.assert_allclose(
            np.asarray(y_ch.reshape(B, H, W, D)), np.asarray(y_ref), atol=1e-5
        )
        # stats are [sum, centered sumsq]: sums add; Q combines via the
        # parallel-variance rule (models/blocks.py:gn_film_affine)
        sc = np.asarray(s_ch).reshape(B, CH, 2, D)
        npix = (H // CH) * W
        s1 = sc[:, :, 0].sum(1)
        mu_i = sc[:, :, 0] / npix
        mu = s1 / (npix * CH)
        q = sc[:, :, 1].sum(1) + npix * ((mu_i - mu[:, None]) ** 2).sum(1)
        np.testing.assert_allclose(s1, np.asarray(s_ref)[:, 0], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(q, np.asarray(s_ref)[:, 1], rtol=1e-4, atol=1e-3)

    def test_stats_large_bias_no_cancellation(self):
        """Regression: with a huge learned bias (|mean|/std ~ 1e4) the
        centered-stats path must still recover the variance; the naive
        E[y^2]-E[y]^2 form loses it entirely in fp32."""
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import conv3x3

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 32, 32, 8).astype(np.float32) * 0.01)
        w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
        bias = jnp.full((8,), 500.0, jnp.float32)

        y, s = conv3x3(x, w, bias, want_stats=True)
        y64 = np.asarray(y, np.float64)
        var_true = y64.reshape(-1, 8).var(0)
        var_got = np.asarray(s)[0, 1] / (32 * 32)
        np.testing.assert_allclose(var_got, var_true, rtol=1e-3)

    def test_chunked_conv_with_prologue_grads(self):
        import jax
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import conv3x3

        rng = np.random.RandomState(1)
        B, H, W, C, CH = 1, 8, 8, 4, 2
        x = jnp.asarray(rng.randn(B * CH, H // CH, W, C).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32))
        b = jnp.zeros((C,), np.float32)
        pro = jnp.asarray(rng.randn(B * CH, 2, C).astype(np.float32))

        def loss(x, w, pro):
            y = conv3x3(x, w, b, pro=pro, chunks=CH)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss, (0, 1, 2))(x, w, pro)
        assert all(np.isfinite(np.asarray(t)).all() for t in g)

    def test_pallas_chunked_matches_xla_chunked(self):
        """The Pallas kernel's cross-chunk halo DMA (neighbour-chunk edge
        rows, zero fill only at true image borders) == the XLA
        halo_pad+VALID path, including per-chunk stats."""
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import conv3x3, xla_conv3x3

        rng = np.random.RandomState(4)
        B, CH, ROWS, W, C = 2, 4, 4, 256, 128
        x = jnp.asarray(rng.randn(B * CH, ROWS, W, C).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.randn(C).astype(np.float32))
        # per-image-constant prologue (the gn_film_affine contract)
        pro1 = rng.randn(B, 2, C).astype(np.float32)
        pro = jnp.asarray(np.repeat(pro1, CH, axis=0))

        ry, rs = xla_conv3x3(x, w, b, pro, want_stats=True, chunks=CH)
        gy, gs = conv3x3(
            x, w, b, pro=pro, want_stats=True, chunks=CH, interpret=True
        )
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry), atol=1e-3)
        rel = np.max(np.abs(np.asarray(gs) - np.asarray(rs))) / (
            np.max(np.abs(np.asarray(rs))) + 1e-9
        )
        assert rel < 1e-5, rel

    def test_pallas_chunked_single_row_tiles(self):
        """ROWS == tile height boundaries: every halo row crosses a chunk
        boundary (tile-interior halo path never taken)."""
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import conv3x3, xla_conv3x3

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1 * 4, 2, 128, 128).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
        b = jnp.zeros((128,), np.float32)
        ref = xla_conv3x3(x, w, b, chunks=4)
        got = conv3x3(x, w, b, chunks=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)

    def test_chunked_dispatch_gate_uses_image_extent(self):
        from kidney_diffusion_tpu.kernels import conv3x3 as c3

        # 8-chunk 1024² image: each chunk is 128x1024 — gated on the
        # image extent, not the chunk extent
        assert c3.supported((8, 128, 1024, 128), (3, 3, 128, 128), chunks=8)
        # same chunk shape as a STANDALONE map is also above the gate
        assert c3.supported((8, 128, 1024, 128), (3, 3, 128, 128))
        # an 8-chunk 181²-equivalent image stays below the default 256² gate
        assert not c3.supported((8, 16, 256, 128), (3, 3, 128, 128), chunks=8)

    def test_bf16_grad_path(self):
        """Regression: bf16 conv grads used to crash in JAX's conv
        transpose (mixed bf16/f32 from preferred_element_type) — the
        custom VJP must carry them."""
        import jax
        import jax.numpy as jnp

        from kidney_diffusion_tpu.kernels.conv3x3 import conv3x3

        x = jnp.ones((2, 8, 8, 4), jnp.bfloat16)
        w = jnp.ones((3, 3, 4, 4), jnp.bfloat16)
        b = jnp.zeros((4,), jnp.float32)

        for chunks in (0, 2):
            g = jax.grad(
                lambda x, w: jnp.mean(
                    conv3x3(x, w, b, chunks=chunks).astype(jnp.float32) ** 2
                ),
                (0, 1),
            )(x, w)
            assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16


def test_conv3x3_int8_quant_path():
    """w8a8 int8 conv: close to the exact conv (dynamic symmetric
    quantization error only), exact stats contract preserved, and the
    chunked quantized conv equals the unchunked one up to quantization
    of identical values (halo zeros are exact in int8)."""
    x, w, b = _conv_inputs(b=2, h=8, w=256)
    ref = c3.xla_conv3x3(x, w, b)
    got = c3.xla_conv3x3(x, w, b, quant=True)
    r = np.asarray(ref)
    g = np.asarray(got)
    assert np.isfinite(g).all()
    rel = np.sqrt(((g - r) ** 2).mean()) / (np.sqrt((r**2).mean()) + 1e-9)
    assert rel < 0.02, rel

    # stats epilogue computed from the dequantized output (consistency:
    # recompute from the returned map)
    gy, gs = c3.xla_conv3x3(x, w, b, quant=True, want_stats=True)
    z = np.asarray(gy, np.float64)
    s1 = z.sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(gs)[:, 0], s1, rtol=1e-2, atol=1e-2)

    # chunked == unchunked (same amax -> same scales -> same int8 values)
    xc = x.reshape(2 * 2, 4, 256, 128)
    yc = c3.xla_conv3x3(xc, w, b, quant=True, chunks=2)
    np.testing.assert_allclose(
        np.asarray(yc).reshape(2, 8, 256, 128), g, atol=1e-4
    )

    # public entry point routes quant through the custom VJP unharmed
    via_pub = c3.conv3x3(x, w, b, quant=True)
    np.testing.assert_allclose(np.asarray(via_pub), g, atol=1e-5)
