"""Range-propagated quantization scales (w8a8 serving path).

The int8 serving path derives every conv's activation scale from
propagated range bounds instead of per-conv dynamic amax reductions
(models/blocks.py range helpers + EfficientUNet threading) — the
quantize then fuses into the pass that already produces/reads the
activation (measured ~5 GB/fwd of HBM passes on the flagship stage 3,
tools/cost_stage3.py). These tests pin the contract that makes that
safe: the bound is a TRUE bound at every quantized site, it is tight
enough to not burn mantissa bits, the quantized output stays as close
to the exact forward as the dynamic-amax path, and gradients (straight
-through, differentiating the exact reference) are bit-identical
either way.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kidney_diffusion_tpu.kernels import conv3x3 as c3
from kidney_diffusion_tpu.models import blocks
from kidney_diffusion_tpu.models.unet import EfficientUNet, UNetConfig


def _rand_params(model, init_args, scale=0.1, seed=7):
    params = model.init(jax.random.PRNGKey(0), *init_args[0], **init_args[1])
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        treedef,
        [scale * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


def _quant_cfg(**kw):
    base = dict(
        dim=16,
        dim_mults=(1, 2),
        num_resnet_blocks=(2, 3),
        layer_attns=(False, True),
        layer_cross_attns=(False, True),
        memory_efficient=True,
        init_conv_to_final_conv_residual=True,
        lowres_cond=True,
        quant_conv="int8",
        attn_heads=2,
        attn_dim_head=8,
    )
    base.update(kw)
    return UNetConfig(**base)


def _inputs(res=32, b=2):
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (b, res, res, 3))
    lr = jnp.tanh(jax.random.normal(k2, (b, res, res, 3)))
    t = jnp.full((b,), 0.37)
    return x, t, lr


def test_conv_range_epilogue_exact():
    """want_range returns the exact post-bias per-channel [max, min],
    unchunked and per-chunk."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 64, 32), jnp.float32).astype(jnp.bfloat16)
    w = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32))).astype(
        jnp.bfloat16
    )
    b = jnp.linspace(-1.0, 1.0, 32, dtype=jnp.float32)
    out, ranges = c3.xla_conv3x3(x, w, b, want_range=True)
    o = np.asarray(out, np.float32)
    np.testing.assert_allclose(
        np.asarray(ranges)[:, 0], o.max(axis=(1, 2)), rtol=1e-2, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(ranges)[:, 1], o.min(axis=(1, 2)), rtol=1e-2, atol=1e-2
    )
    # the scalar helper: exact tensor amax
    np.testing.assert_allclose(
        float(blocks.amax_from_ranges(ranges)), np.abs(o).max(), rtol=1e-2
    )
    # chunked: per-chunk rows, same global amax
    xc = x.reshape(4, 4, 64, 32)
    outc, rc = c3.xla_conv3x3(xc, w, b, chunks=2, want_range=True)
    assert rc.shape == (4, 2, 32)
    np.testing.assert_allclose(
        float(blocks.amax_from_ranges(rc)), np.abs(o).max(), rtol=1e-2
    )


def test_silu_affine_amax_is_a_tight_bound():
    """The deferred GN+FiLM+SiLU range bound is a true bound and tight to
    within the silu negative-lobe constant."""
    k = jax.random.PRNGKey(5)
    y = 3.0 * jax.random.normal(k, (2, 64, 16), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(6), (2, 16))  # signed scales
    c = jax.random.normal(jax.random.PRNGKey(7), (2, 16))
    affine = jnp.stack([a, c], axis=1)
    ranges = jnp.stack([y.max(axis=1), y.min(axis=1)], axis=1)
    bound = float(blocks.silu_affine_amax(affine, ranges))
    true = float(
        jnp.max(jnp.abs(jax.nn.silu(y * a[:, None] + c[:, None])))
    )
    assert bound >= true * (1 - 1e-6)
    assert bound <= max(true * 1.05, true + 0.28), (bound, true)


@pytest.mark.parametrize("chunks,storage", [(0, None), (4, "float8_e4m3fn")])
def test_propagated_bounds_hold_at_every_site(monkeypatch, chunks, storage):
    """Every quantized conv receives a TRUE bound on its (post-prologue)
    input amax, and the bounds stay tight enough to matter (<< one lost
    bit on median, bounded worst case across residual chains)."""
    monkeypatch.setenv("KDT_QUANT_MIN_PIX", "1")
    monkeypatch.setenv("KDT_QUANT_MIN_CH", "1")

    records = []
    orig = c3._int8_conv

    def spy(x, w, ch, a_max=None):
        if a_max is not None:
            true = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
            records.append((float(a_max), true))
        else:
            records.append(None)
        return orig(x, w, ch, a_max)

    monkeypatch.setattr(c3, "_int8_conv", spy)

    cfg = _quant_cfg(spatial_chunks=chunks, storage_dtype=storage)
    model = EfficientUNet(cfg)
    x, t, lr = _inputs()
    params = _rand_params(model, ((x, t), dict(lowres_cond_img=lr)))
    model.apply(params, x, t, lowres_cond_img=lr)

    bounded = [r for r in records if r is not None]
    unbounded = len(records) - len(bounded)
    assert len(bounded) >= 15, (len(bounded), unbounded)
    # every propagated bound is a true bound (fp32 slack only)
    for bound, true in bounded:
        assert np.isfinite(bound)
        assert bound >= true * (1 - 1e-3), (bound, true)
    ratios = sorted(b / max(t, 1e-9) for b, t in bounded)
    # median sites are near-exact; residual-chain subadditivity bounds
    # the worst case (empirically ~2-4x on random params = 1-2 bits)
    assert ratios[len(ratios) // 2] < 4.0, ratios
    assert ratios[-1] < 32.0, ratios


def test_ranges_off_escape_hatch_restores_dynamic(monkeypatch):
    """KDT_QUANT_RANGES=0 runs the per-conv dynamic-amax path; both
    variants approximate the exact forward comparably."""
    monkeypatch.setenv("KDT_QUANT_MIN_PIX", "1")
    monkeypatch.setenv("KDT_QUANT_MIN_CH", "1")
    cfg = _quant_cfg(spatial_chunks=4, storage_dtype="float8_e4m3fn")
    model = EfficientUNet(cfg)
    x, t, lr = _inputs()
    params = _rand_params(model, ((x, t), dict(lowres_cond_img=lr)))

    exact = EfficientUNet(
        dataclasses.replace(cfg, quant_conv=None, storage_dtype=None)
    ).apply(params, x, t, lowres_cond_img=lr)
    got_ranges = model.apply(params, x, t, lowres_cond_img=lr)
    monkeypatch.setenv("KDT_QUANT_RANGES", "0")
    got_dynamic = model.apply(params, x, t, lowres_cond_img=lr)

    r = np.asarray(exact, np.float32).ravel()

    def rel(o):
        o = np.asarray(o, np.float32).ravel()
        return float(np.sqrt(((o - r) ** 2).mean()) / (np.sqrt((r**2).mean()) + 1e-9))

    e_ranges, e_dynamic = rel(got_ranges), rel(got_dynamic)
    assert np.isfinite(np.asarray(got_ranges)).all()
    assert e_ranges < 2.0 * e_dynamic + 0.02, (e_ranges, e_dynamic)


def test_want_range_epilogue_leaves_grads_untouched():
    """The range epilogue is stop_gradient'd aux output: the same conv
    with and without want_range has bit-identical input/weight grads
    (pins the custom-vjp cotangent plumbing for the extra output)."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 64, 32), jnp.float32).astype(jnp.bfloat16)
    w = (0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32))).astype(
        jnp.bfloat16
    )
    b = jnp.linspace(-1.0, 1.0, 32, dtype=jnp.float32)

    def loss_plain(x, w, b):
        y, s = c3.conv3x3(x, w, b, want_stats=True)
        return jnp.mean(y.astype(jnp.float32) ** 2) + jnp.mean(s**2)

    def loss_range(x, w, b):
        y, s, r = c3.conv3x3(x, w, b, want_stats=True, want_range=True)
        return jnp.mean(y.astype(jnp.float32) ** 2) + jnp.mean(s**2)

    g1 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_range, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_quant_grads_flow_with_ranges(monkeypatch):
    """Straight-through gradients stay finite and close to the exact
    model's gradients on the range-propagated path (the quantized
    forward differs slightly between scale schemes, so downstream grads
    can too — the contract is approximation, not bit-equality)."""
    monkeypatch.setenv("KDT_QUANT_MIN_PIX", "1")
    monkeypatch.setenv("KDT_QUANT_MIN_CH", "1")
    cfg = _quant_cfg(spatial_chunks=0, storage_dtype=None)
    x, t, lr = _inputs(res=16)
    model = EfficientUNet(cfg)
    params = _rand_params(model, ((x, t), dict(lowres_cond_img=lr)))

    def loss(m):
        def f(p):
            return jnp.mean(m.apply(p, x, t, lowres_cond_img=lr) ** 2)

        return f

    gq = jax.grad(loss(model))(params)
    gx = jax.grad(
        loss(EfficientUNet(dataclasses.replace(cfg, quant_conv=None)))
    )(params)
    leaves_q, leaves_x = jax.tree.leaves(gq), jax.tree.leaves(gx)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves_q)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(leaves_q, leaves_x))
    den = sum(float(jnp.sum(b**2)) for b in leaves_x) + 1e-12
    assert (num / den) ** 0.5 < 0.25, (num / den) ** 0.5
