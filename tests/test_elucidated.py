import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kidney_diffusion_tpu.core.elucidated import EDMConfig, edm_loss, edm_sample_loop
from kidney_diffusion_tpu.models.configs import elucidated, patch_conditioned, tiny_test_cascade


def test_schedule_properties():
    cfg = EDMConfig(num_sample_steps=16, sigma_min=0.002, sigma_max=80.0)
    s = np.asarray(cfg.sample_schedule())
    assert s.shape == (17,)
    assert abs(s[0] - 80.0) < 1e-3
    assert abs(s[-2] - 0.002) < 1e-4
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_preconditioning_boundary_conditions():
    cfg = EDMConfig()
    # as sigma -> 0: c_skip -> 1, c_out -> 0 (identity around clean data)
    assert abs(float(cfg.c_skip(jnp.asarray(1e-6))) - 1.0) < 1e-4
    assert float(cfg.c_out(jnp.asarray(1e-6))) < 1e-5
    # variance normalisation: c_in = 1/sqrt(sigma² + sigma_data²)
    np.testing.assert_allclose(
        float(cfg.c_in(jnp.asarray(2.0))), 1 / np.sqrt(4 + 0.25), rtol=1e-6
    )


def test_edm_loss_zero_for_oracle():
    cfg = EDMConfig()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.uniform(k1, (2, 8, 8, 3), minval=-1, maxval=1)
    noise = jax.random.normal(k2, x0.shape)
    sigmas = cfg.noise_distribution(k3, 2)

    # oracle raw net: F = (x0 - c_skip * x_noisy) / c_out
    def oracle(x_in, c_noise):
        sigma = jnp.exp(c_noise * 4.0)
        sp = sigma.reshape(-1, 1, 1, 1)
        x_noisy = x_in / cfg.c_in(sp)
        return (x0 - cfg.c_skip(sp) * x_noisy) / cfg.c_out(sp)

    losses = edm_loss(cfg, oracle, x0, sigmas, noise)
    assert float(jnp.max(losses)) < 1e-6


def test_edm_sample_recovers_target():
    cfg = EDMConfig(num_sample_steps=24, S_churn=0.0)
    target = jnp.full((1, 8, 8, 3), 0.25)

    def oracle(x_in, c_noise):
        sigma = jnp.exp(c_noise * 4.0)
        sp = sigma.reshape(-1, 1, 1, 1)
        x_noisy = x_in / cfg.c_in(sp)
        t = jnp.broadcast_to(target, x_noisy.shape)
        return (t - cfg.c_skip(sp) * x_noisy) / cfg.c_out(sp)

    out = edm_sample_loop(cfg, oracle, (2, 8, 8, 3), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=0.05)


def test_edm_inpaint_keeps_known():
    cfg = EDMConfig(num_sample_steps=16, S_churn=0.0)
    target = jnp.full((1, 8, 8, 3), 0.25)

    def oracle(x_in, c_noise):
        sigma = jnp.exp(c_noise * 4.0)
        sp = sigma.reshape(-1, 1, 1, 1)
        x_noisy = x_in / cfg.c_in(sp)
        t = jnp.broadcast_to(target, x_noisy.shape)
        return (t - cfg.c_skip(sp) * x_noisy) / cfg.c_out(sp)

    known = jnp.full((1, 8, 8, 3), -0.5)
    mask = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    out = edm_sample_loop(
        cfg, oracle, (1, 8, 8, 3), jax.random.PRNGKey(1),
        inpaint_images=known, inpaint_masks=mask, inpaint_resample_times=2,
    )
    np.testing.assert_allclose(np.asarray(out[:, :4]), -0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), 0.25, atol=0.1)


def test_elucidated_config_transform():
    cc = elucidated(patch_conditioned())
    assert cc.name.endswith("_elucidated")
    assert cc.stage(1).sampler == "edm"
    assert cc.stage(1).edm.num_sample_steps == 32
    assert cc.stage(3).edm.sigma_max == 1280.0


def test_elucidated_cascade_train_and_sample():
    from kidney_diffusion_tpu.cascade import Cascade

    cc = elucidated(
        tiny_test_cascade(image_sizes=(16, 32), timesteps=8),
        num_sample_steps=(6, 6, 6), sigma_max=(80.0, 320.0, 320.0),
    )
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    loss1 = cas.stage_loss(params[0], 1, jax.random.PRNGKey(1), images)
    loss2 = cas.stage_loss(params[1], 2, jax.random.PRNGKey(2), images)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))

    out = cas.sample(params, jax.random.PRNGKey(3), batch_size=1)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_elucidated_gigapixel_orchestrator():
    """EDM-sampled stages work inside the wavefront orchestrator."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.sample.gigapixel import GridSpec, generate_patch_set
    from kidney_diffusion_tpu.sample.wavefront import full_grid

    cc = elucidated(
        tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4),
        num_sample_steps=(4, 4, 4), sigma_max=(80.0, 320.0, 320.0),
    )
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=2, overlap=0.25)
    pos = full_grid(2)
    cond = np.random.default_rng(0).uniform(size=(4, 32, 32, 3)).astype(np.float32)
    patches = generate_patch_set(
        cas, params, jax.random.PRNGKey(0),
        patch_pos=pos, grid=grid, cond_images=cond,
        inpaint_resample_times=2, progress=False,
    )
    assert set(patches) == set(pos)
    assert all(np.isfinite(p.astype(np.float32)).all() for p in patches.values())
