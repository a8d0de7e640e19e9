import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kidney_diffusion_tpu.models import EfficientUNet, UNetConfig
from kidney_diffusion_tpu.models.configs import (
    get_cascade,
    kumar,
    patch_conditioned,
    patch_unconditional,
    tiny_test_cascade,
    ultra_res,
)


def _tiny(**kw):
    base = dict(
        dim=16,
        dim_mults=(1, 2),
        num_resnet_blocks=1,
        layer_attns=(False, True),
        layer_cross_attns=(False, True),
        attn_heads=2,
        attn_dim_head=8,
        dtype="float32",
    )
    base.update(kw)
    return UNetConfig(**base)


def _run(cfg, size=16, batch=2, **call_kw):
    model = EfficientUNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, size, size, cfg.channels))
    t = jnp.full((batch,), 0.5)
    params = model.init(key, x, t, **call_kw)
    out = model.apply(params, x, t, **call_kw)
    return out, params


def test_unconditional_shapes():
    out, params = _run(_tiny())
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_init_final_conv():
    # final conv is zero-initialised -> output exactly zero at init
    out, _ = _run(_tiny())
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_text_conditioning_and_cfg_dropout():
    cfg = _tiny(text_embed_dim=3)
    model = EfficientUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 0.3)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, text_embeds=emb)

    kept = model.apply(params, x, t, text_embeds=emb, cond_drop_mask=jnp.zeros((2,)))
    dropped = model.apply(params, x, t, text_embeds=emb, cond_drop_mask=jnp.ones((2,)))
    # a fully-dropped pass must not depend on the text embeds
    emb2 = emb + 100.0
    dropped2 = model.apply(params, x, t, text_embeds=emb2, cond_drop_mask=jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(dropped), np.asarray(dropped2), atol=1e-5)
    # and must differ from the kept pass once params are trained;
    # at zero-init output both are 0, so compare an internal:
    assert dropped.shape == kept.shape


def test_lowres_cond_concat():
    cfg = _tiny(lowres_cond=True, memory_efficient=True, init_conv_to_final_conv_residual=True)
    model = EfficientUNet(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    lr = jnp.zeros((1, 16, 16, 3))
    t = jnp.full((1,), 0.5)
    params = model.init(
        jax.random.PRNGKey(0), x, t, lowres_cond_img=lr, lowres_noise_times=jnp.zeros((1,))
    )
    out = model.apply(params, x, t, lowres_cond_img=lr, lowres_noise_times=jnp.zeros((1,)))
    assert out.shape == (1, 16, 16, 3)
    with pytest.raises(AssertionError):
        model.apply(params, x, t)  # missing lowres image must fail loudly


def test_cond_images_resized():
    cfg = _tiny(cond_images_channels=4)
    model = EfficientUNet(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.full((1,), 0.5)
    cond = jnp.ones((1, 8, 8, 4))  # wrong spatial size -> resized internally
    params = model.init(jax.random.PRNGKey(0), x, t, cond_images=cond)
    out = model.apply(params, x, t, cond_images=cond)
    assert out.shape == (1, 16, 16, 3)


def test_per_level_resnet_counts():
    cfg = _tiny(num_resnet_blocks=(1, 2), memory_efficient=True)
    out, _ = _run(cfg)
    assert out.shape == (2, 16, 16, 3)


def test_jit_and_grad():
    cfg = _tiny()
    model = EfficientUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(1), x, t)

    @jax.jit
    def loss_fn(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g = jax.grad(loss_fn)(params)
    assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(params)
    # some gradient must be nonzero (e.g. final conv bias path)
    total = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(g))
    assert np.isfinite(total)


@pytest.mark.parametrize(
    "factory",
    [patch_conditioned, patch_unconditional, kumar, lambda: ultra_res(1, "v2"),
     lambda: ultra_res(0, "v_param"), lambda: ultra_res(2, "airs")],
)
def test_reference_variant_configs_constructible(factory):
    cc = factory()
    assert cc.num_stages in (2, 3)
    assert cc.stage(1).image_size == 64
    for i, st in enumerate(cc.stages):
        assert st.lowres_cond == (i > 0)


def test_reference_stage1_param_scale():
    """Base unet (dim 256) init works and has a plausible parameter count."""
    cc = patch_unconditional()
    model = EfficientUNet(cc.stage(1).unet)
    x = jnp.zeros((1, 64, 64, 3))
    t = jnp.full((1,), 0.5)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # A few hundred million params, comparable to imagen base unets
    assert 5e7 < n < 2e9, n


def test_registry():
    cc = get_cascade("ultra_res", magnification_level=0, version="v1")
    assert cc.stage(1).unet.cond_images_channels == 0
    cc = get_cascade("ultra_res", magnification_level=1, version="v2")
    assert cc.stage(1).unet.cond_images_channels == 6
    with pytest.raises(KeyError):
        get_cascade("nope")


def test_tiny_cascade_helper():
    cc = tiny_test_cascade(condition_on_text=True, cond_images_channels=2)
    assert cc.num_stages == 2
    assert cc.stage(2).unet.lowres_cond


def test_remat_matches_plain():
    """remat=True changes memory, not math: outputs and grads agree."""
    cfg_plain = _tiny()
    cfg_remat = _tiny(remat=True)
    model_p = EfficientUNet(cfg_plain)
    model_r = EfficientUNet(cfg_remat)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.full((2,), 0.5)
    params = model_p.init(jax.random.PRNGKey(1), x, t)

    out_p = model_p.apply(params, x, t)
    out_r = model_r.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-6)

    g_p = jax.grad(lambda p: jnp.mean(model_p.apply(p, x, t) ** 2))(params)
    g_r = jax.grad(lambda p: jnp.mean(model_r.apply(p, x, t) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_downsample_strided_equals_s2d_matmul():
    """Downsample's 2x2 stride-2 conv must equal space-to-depth + 1x1
    conv with the kernel reshaped (2,2,C,D) <-> (1,1,4C,D)."""
    import jax
    import jax.numpy as jnp

    from kidney_diffusion_tpu.models.blocks import Downsample

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 5).astype(np.float32))
    mod = Downsample(7, jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 5, 7).astype(np.float32))
    b = jnp.asarray(rng.randn(7).astype(np.float32))
    got = mod.apply({"params": {"proj": {"kernel": k, "bias": b}}}, x)

    s2d = x.reshape(2, 4, 2, 5, 2, 5).transpose(0, 1, 3, 2, 4, 5).reshape(2, 4, 5, 20)
    want = jax.lax.conv_general_dilated(
        s2d, k.reshape(1, 1, 20, 7), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_spatial_chunks_equivalence():
    """spatial_chunks must not change the function: fp32 chunked vs
    unchunked forward and grads agree tightly."""
    import dataclasses

    cfg0 = UNetConfig(
        dim=16, dim_mults=(1, 2), channels=3, cond_dim=16, text_embed_dim=3,
        num_resnet_blocks=(1, 2), layer_attns=(False, True),
        layer_cross_attns=(False, True), attn_heads=2, attn_dim_head=8,
        memory_efficient=True, lowres_cond=True, groups=4, dtype="float32",
    )
    cfg4 = dataclasses.replace(cfg0, spatial_chunks=4)

    rng = np.random.RandomState(0)
    B, H, W = 2, 32, 32
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    lr = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(B).astype(np.float32))
    te = jnp.asarray(rng.randn(B, 2, 3).astype(np.float32))
    lt = jnp.asarray(rng.rand(B).astype(np.float32))

    m0, m4 = EfficientUNet(cfg0), EfficientUNet(cfg4)
    p = m0.init(jax.random.PRNGKey(0), x, t, text_embeds=te,
                lowres_cond_img=lr, lowres_noise_times=lt)
    leaves, td = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    p = jax.tree_util.tree_unflatten(
        td, [0.1 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )

    kw = dict(text_embeds=te, lowres_cond_img=lr, lowres_noise_times=lt)
    y0 = m0.apply(p, x, t, **kw)
    y4 = m4.apply(p, x, t, **kw)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y0), atol=5e-5)

    def loss(p, mod):
        return jnp.mean(mod.apply(p, x, t, **kw) ** 2)

    g0, g4 = jax.grad(loss)(p, m0), jax.grad(loss)(p, m4)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_spatial_chunks_fallback_on_unchunkable_shapes():
    """H not divisible by chunks*2^levels -> silently runs unchunked."""
    import dataclasses

    cfg = UNetConfig(
        dim=8, dim_mults=(1, 2), channels=3, num_resnet_blocks=1,
        memory_efficient=True, groups=4, dtype="float32", spatial_chunks=8,
    )
    m = EfficientUNet(cfg)
    x = jnp.zeros((1, 20, 20, 3))  # 20 % (8*4) != 0
    t = jnp.zeros((1,))
    p = m.init(jax.random.PRNGKey(0), x, t)
    assert m.apply(p, x, t).shape == (1, 20, 20, 3)


def test_spatial_chunks_production_topology():
    """The sr1024 training-crop case: 4 levels, H=256 -> 2 rows per
    chunk at the deepest level for chunks=8 and 1 row per chunk for the
    shipped chunks=16 (models/configs.py). Equivalence must hold at
    both boundary topologies."""
    import dataclasses

    cfg0 = UNetConfig(
        dim=8, dim_mults=(1, 1, 2, 2), channels=3, num_resnet_blocks=1,
        layer_attns=False, layer_cross_attns=False, memory_efficient=True,
        lowres_cond=True, groups=4, dtype="float32",
    )

    rng = np.random.RandomState(0)
    H = 256  # 256 / {8,16} / 2^4 = {2,1} rows per chunk, deepest level
    x = jnp.asarray(rng.rand(1, H, H, 3).astype(np.float32))
    lr = jnp.asarray(rng.rand(1, H, H, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(1).astype(np.float32))

    m0 = EfficientUNet(cfg0)
    p = m0.init(jax.random.PRNGKey(0), x, t, lowres_cond_img=lr,
                lowres_noise_times=t)
    leaves, td = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    p = jax.tree_util.tree_unflatten(
        td, [0.1 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    kw = dict(lowres_cond_img=lr, lowres_noise_times=t)
    y0 = m0.apply(p, x, t, **kw)
    for ch in (8, 16):
        mch = EfficientUNet(dataclasses.replace(cfg0, spatial_chunks=ch))
        ych = mch.apply(p, x, t, **kw)
        np.testing.assert_allclose(
            np.asarray(ych), np.asarray(y0), atol=1e-4, err_msg=f"chunks={ch}"
        )


def test_storage_dtype_narrow_activations():
    """UNetConfig.storage_dtype: block-boundary activations and skips are
    stored in a narrow dtype (float8) while compute stays wide. The
    forward must run across the config surface (plain, memory_efficient
    + init-conv residual, spatial_chunks) and stay close to the
    wide-stored forward — the difference is coarse-mantissa rounding at
    block boundaries only."""
    import dataclasses

    for kw in (
        dict(),
        dict(memory_efficient=True, init_conv_to_final_conv_residual=True),
        dict(spatial_chunks=2),
    ):
        cfg = _tiny(**kw)
        model = EfficientUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.full((2,), 0.4)
        params = model.init(jax.random.PRNGKey(0), x, t)
        # randomise: the zero-init final conv would make every output 0
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        params = jax.tree.unflatten(
            treedef,
            [
                0.1 * jax.random.normal(k, l.shape, l.dtype)
                for k, l in zip(keys, leaves)
            ],
        )
        ref = model.apply(params, x, t)
        f8 = dataclasses.replace(cfg, storage_dtype="float8_e4m3fn")
        out = EfficientUNet(f8).apply(params, x, t)
        assert out.shape == ref.shape and out.dtype == ref.dtype
        r = np.asarray(ref).ravel()
        o = np.asarray(out).ravel()
        assert np.isfinite(o).all()
        rms = float(np.sqrt(((o - r) ** 2).mean()))
        ref_rms = float(np.sqrt((r**2).mean())) + 1e-8
        assert rms / ref_rms < 0.5, (kw, rms / ref_rms)
        # and storage_dtype=None stays the byte-identical default
        same = EfficientUNet(dataclasses.replace(cfg, storage_dtype=None)).apply(
            params, x, t
        )
        np.testing.assert_array_equal(np.asarray(same).ravel(), r)


def test_quant_conv_int8_serving_path(monkeypatch):
    """UNetConfig.quant_conv="int8": the w8a8 serving path stays close to
    the exact forward, agrees between chunked and unchunked execution,
    and leaves the default path byte-identical. The site gate is forced
    open so the tiny config exercises quantized convs at all."""
    import dataclasses

    monkeypatch.setenv("KDT_QUANT_MIN_PIX", "1")
    monkeypatch.setenv("KDT_QUANT_MIN_CH", "1")

    for kw in (
        dict(),
        dict(memory_efficient=True, init_conv_to_final_conv_residual=True),
    ):
        cfg = _tiny(**kw)
        model = EfficientUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.full((2,), 0.4)
        params = model.init(jax.random.PRNGKey(0), x, t)
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        params = jax.tree.unflatten(
            treedef,
            [
                0.1 * jax.random.normal(k, l.shape, l.dtype)
                for k, l in zip(keys, leaves)
            ],
        )
        ref = model.apply(params, x, t)
        q = EfficientUNet(dataclasses.replace(cfg, quant_conv="int8")).apply(
            params, x, t
        )
        assert q.shape == ref.shape and q.dtype == ref.dtype
        r = np.asarray(ref).ravel()
        o = np.asarray(q).ravel()
        assert np.isfinite(o).all()
        rms = float(np.sqrt(((o - r) ** 2).mean()))
        ref_rms = float(np.sqrt((r**2).mean())) + 1e-8
        assert rms / ref_rms < 0.1, (kw, rms / ref_rms)
        # chunked quantized execution approximates the same function
        # (amax is over the same full tensor; halo zeros are exact int8)
        qc = EfficientUNet(
            dataclasses.replace(cfg, quant_conv="int8", spatial_chunks=2)
        ).apply(params, x, t)
        oc = np.asarray(qc).ravel()
        rms_c = float(np.sqrt(((oc - r) ** 2).mean()))
        assert rms_c / ref_rms < 0.1, (kw, rms_c / ref_rms)
        # default path untouched
        same = EfficientUNet(dataclasses.replace(cfg, quant_conv=None)).apply(
            params, x, t
        )
        np.testing.assert_array_equal(np.asarray(same).ravel(), r)
