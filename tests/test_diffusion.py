import jax
import jax.numpy as jnp
import numpy as np

from kidney_diffusion_tpu.core import (
    GaussianDiffusion,
    diffusion_loss,
    dynamic_threshold,
    sample_loop,
    ddim_sample_loop,
)


def test_dynamic_threshold_identity_within_range():
    x = jnp.full((2, 4, 4, 3), 0.5)
    out = dynamic_threshold(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_dynamic_threshold_rescales():
    x = jnp.concatenate(
        [jnp.full((1, 4, 4, 3), 4.0), jnp.full((1, 4, 4, 3), 0.1)], axis=0
    )
    out = np.asarray(dynamic_threshold(x, percentile=0.95))
    assert out.max() <= 1.0 + 1e-6
    # the small sample is untouched
    np.testing.assert_allclose(out[1], 0.1, atol=1e-6)


def test_loss_zero_for_perfect_model():
    gd = GaussianDiffusion(num_timesteps=64)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.uniform(k1, (3, 8, 8, 3), minval=-1, maxval=1)
    noise = jax.random.normal(k2, x0.shape)
    times = jax.random.uniform(k3, (3,))

    # oracle eps model
    loss = diffusion_loss(gd, lambda x_t, t: noise, x0, times, noise, objective="noise")
    assert float(loss.max()) < 1e-10

    # oracle v model
    v = gd.calculate_v(x0, times, noise)
    loss_v = diffusion_loss(gd, lambda x_t, t: v, x0, times, noise, objective="v")
    assert float(loss_v.max()) < 1e-10


def _oracle_denoiser(gd, target):
    """eps-prediction oracle for a deterministic target image."""

    def fn(x_t, t):
        return gd.predict_noise_from_start(x_t, t, jnp.broadcast_to(target, x_t.shape))

    return fn


def test_sample_loop_recovers_target():
    # With an oracle denoiser pointing at a constant image, ancestral
    # sampling must converge to that image.
    gd = GaussianDiffusion(num_timesteps=64)
    target = jnp.full((1, 8, 8, 3), 0.25)
    out = sample_loop(
        gd,
        _oracle_denoiser(gd, target),
        (2, 8, 8, 3),
        jax.random.PRNGKey(0),
        objective="noise",
    )
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=0.05)


def test_ddim_loop_recovers_target():
    gd = GaussianDiffusion(num_timesteps=64)
    target = jnp.full((1, 8, 8, 3), -0.5)
    out = ddim_sample_loop(
        gd,
        _oracle_denoiser(gd, target),
        (2, 8, 8, 3),
        jax.random.PRNGKey(1),
        objective="noise",
        num_steps=16,
    )
    np.testing.assert_allclose(np.asarray(out), -0.5, atol=0.05)


def test_inpaint_keeps_known_pixels():
    gd = GaussianDiffusion(num_timesteps=32)
    target = jnp.full((1, 8, 8, 3), 0.25)
    known = jnp.full((1, 8, 8, 3), -0.75)
    mask = jnp.zeros((1, 8, 8))
    mask = mask.at[:, :4, :].set(1.0)  # top half known

    out = sample_loop(
        gd,
        _oracle_denoiser(gd, target),
        (1, 8, 8, 3),
        jax.random.PRNGKey(2),
        objective="noise",
        inpaint_images=known,
        inpaint_masks=mask,
        inpaint_resample_times=3,
    )
    out = np.asarray(out)
    # known region exactly preserved
    np.testing.assert_allclose(out[:, :4, :, :], -0.75, atol=1e-6)
    # unknown region converged toward the oracle target
    np.testing.assert_allclose(out[:, 4:, :, :], 0.25, atol=0.1)


def test_sample_loop_jittable():
    gd = GaussianDiffusion(num_timesteps=8)
    target = jnp.zeros((1, 4, 4, 3))

    @jax.jit
    def run(key):
        return sample_loop(
            gd, _oracle_denoiser(gd, target), (1, 4, 4, 3), key, objective="noise"
        )

    out = run(jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 4, 3)


def test_ddim_inpaint_keeps_known_pixels():
    gd = GaussianDiffusion(num_timesteps=32)
    target = jnp.full((1, 8, 8, 3), 0.25)
    known = jnp.full((1, 8, 8, 3), -0.75)
    mask = jnp.zeros((1, 8, 8)).at[:, :4, :].set(1.0)

    out = ddim_sample_loop(
        gd,
        _oracle_denoiser(gd, target),
        (1, 8, 8, 3),
        jax.random.PRNGKey(2),
        objective="noise",
        num_steps=16,
        inpaint_images=known,
        inpaint_masks=mask,
        inpaint_resample_times=3,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, :4, :, :], -0.75, atol=1e-6)
    np.testing.assert_allclose(out[:, 4:, :, :], 0.25, atol=0.1)


def test_ddim_eta_stochasticity():
    """eta=0 is deterministic DDIM; eta>0 injects noise (Song et al.
    2020 eq. 16) — exposes /root/repo's serving-surface `ddim_eta`."""
    gd = GaussianDiffusion(num_timesteps=64)
    target = jnp.full((1, 8, 8, 3), 0.25)
    denoiser = _oracle_denoiser(gd, target)

    def run(eta, seed):
        return ddim_sample_loop(
            gd,
            denoiser,
            (2, 8, 8, 3),
            jax.random.PRNGKey(seed),
            objective="noise",
            num_steps=16,
            eta=eta,
        )

    # same key, eta=0 -> bitwise deterministic
    np.testing.assert_array_equal(np.asarray(run(0.0, 0)), np.asarray(run(0.0, 0)))
    # eta>0 with same key differs from eta=0 (extra noise path)
    a, b = np.asarray(run(0.0, 0)), np.asarray(run(1.0, 0))
    assert np.max(np.abs(a - b)) > 1e-4
    # and still converges to the oracle target
    np.testing.assert_allclose(b, 0.25, atol=0.07)


def test_cascade_sample_stage_exposes_ddim_eta():
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    cascade = Cascade(tiny_test_cascade(num_stages=1, image_sizes=(16,)))
    params = cascade.init_stage_params(jax.random.PRNGKey(0), 1)

    def run(eta):
        return cascade.sample_stage(
            params, 1, jax.random.PRNGKey(7), batch_size=2,
            use_ddim=True, ddim_steps=4, ddim_eta=eta,
        )

    a0, a0b, a1 = np.asarray(run(0.0)), np.asarray(run(0.0)), np.asarray(run(0.7))
    np.testing.assert_array_equal(a0, a0b)
    assert np.max(np.abs(a0 - a1)) > 1e-5


def test_dpmpp_recovers_target():
    """DPM-Solver++(2M) with an oracle denoiser converges to the target
    in FAR fewer steps than the training discretisation."""
    from kidney_diffusion_tpu.core.diffusion import dpmpp_sample_loop

    gd = GaussianDiffusion(num_timesteps=64)
    target = jnp.full((1, 8, 8, 3), 0.25)
    for steps in (8, 25):
        out = dpmpp_sample_loop(
            gd, _oracle_denoiser(gd, target), (2, 8, 8, 3),
            jax.random.PRNGKey(0), objective="noise", num_steps=steps,
        )
        assert float(jnp.abs(out - 0.25).max()) < 0.05, steps


def test_dpmpp_deterministic():
    from kidney_diffusion_tpu.core.diffusion import dpmpp_sample_loop

    gd = GaussianDiffusion(num_timesteps=64)
    target = jnp.full((1, 8, 8, 3), -0.3)
    a = dpmpp_sample_loop(gd, _oracle_denoiser(gd, target), (1, 8, 8, 3),
                          jax.random.PRNGKey(3), num_steps=12)
    b = dpmpp_sample_loop(gd, _oracle_denoiser(gd, target), (1, 8, 8, 3),
                          jax.random.PRNGKey(3), num_steps=12)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpmpp_inpaint_keeps_known_pixels():
    from kidney_diffusion_tpu.core.diffusion import dpmpp_sample_loop

    gd = GaussianDiffusion(num_timesteps=64)
    target = jnp.full((1, 8, 8, 3), 0.25)
    mask = jnp.zeros((2, 8, 8)).at[:, :4].set(1.0)
    known = jnp.full((2, 8, 8, 3), -0.5)
    out = dpmpp_sample_loop(
        gd, _oracle_denoiser(gd, target), (2, 8, 8, 3),
        jax.random.PRNGKey(1), num_steps=16,
        inpaint_images=known, inpaint_masks=mask, inpaint_resample_times=2,
    )
    np.testing.assert_allclose(np.asarray(out)[:, :4], -0.5, atol=1e-6)
    assert float(jnp.abs(out[:, 4:] - 0.25).max()) < 0.05


def test_dpmpp_through_cascade_api():
    """dpmpp_steps flows through sample_stage/sample end to end."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    c = Cascade(tiny_test_cascade())
    params = [c.init_stage_params(jax.random.PRNGKey(i), i) for i in (1, 2)]
    out = c.sample(params, jax.random.PRNGKey(0), batch_size=1, dpmpp_steps=6)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dpmpp_matches_numpy_reference():
    """Step-for-step pin of the 2M solver against an independent numpy
    transcription of Lu et al. 2022 Algorithm 2 (data prediction,
    uniform-in-t spacing, lower-order first/final steps) under the same
    schedule and oracle denoiser."""
    from kidney_diffusion_tpu.core.diffusion import dpmpp_sample_loop

    gd = GaussianDiffusion(num_timesteps=64)
    target = np.full((1, 4, 4, 3), 0.2, np.float32)
    num_steps = 10

    def log_snr(t):
        return np.asarray(gd.log_snr(jnp.asarray(t, jnp.float32)))

    def alpha_sigma(t):
        ls = log_snr(t)
        return np.sqrt(1 / (1 + np.exp(-ls))), np.sqrt(1 / (1 + np.exp(ls)))

    # same init noise as the jax loop (consumes the same split)
    key = jax.random.PRNGKey(5)
    _, init_key = jax.random.split(key)
    x = np.asarray(jax.random.normal(init_key, (1, 4, 4, 3), jnp.float32))

    times = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float32)
    x0_prev, lam_prev = None, None
    for i in range(num_steps):
        t, t_next = float(times[i]), float(times[i + 1])
        # oracle denoiser -> x0 (dynamic threshold is a no-op: |x0| <= 1)
        x0 = np.broadcast_to(target, x.shape)
        lam = 0.5 * log_snr(t)
        lam_next = 0.5 * log_snr(t_next)
        h = lam_next - lam
        _, sigma = alpha_sigma(t)
        alpha_next, sigma_next = alpha_sigma(t_next)
        if x0_prev is None or i == num_steps - 1:
            d = x0
        else:
            r = (lam - lam_prev) / h
            d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev
        x = (sigma_next / sigma) * x - alpha_next * np.expm1(-h) * d
        x0_prev, lam_prev = x0, lam
    ref = np.clip(x, -1, 1)

    out = dpmpp_sample_loop(
        gd, _oracle_denoiser(gd, jnp.asarray(target)), (1, 4, 4, 3),
        jax.random.PRNGKey(5), objective="noise", num_steps=num_steps,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def test_dpmpp_inpaint_resample_matches_numpy_reference():
    """Pin the dpmpp x RePaint-resampling path (--dpmpp_steps +
    --inpaint_resample in sample_ultra_res/outpainting) step-for-step:
    a numpy transcription of Algorithm 2 interleaved with the RePaint
    blend/renoise contract. Within a resample round the solver re-enters
    the update at the SAME t (h_prev = 0) and must drop to first order
    (d = x0) — not extrapolate 2*x0 - x0_prev across the renoise."""
    from kidney_diffusion_tpu.core.diffusion import dpmpp_sample_loop

    gd = GaussianDiffusion(num_timesteps=64)
    shape = (1, 4, 4, 3)
    target = np.full(shape, 0.2, np.float32)
    num_steps = 8
    resample_times = 3

    known = jnp.full(shape, -0.6, jnp.float32)
    mask_2d = jnp.zeros((1, 4, 4)).at[:, :2, :].set(1.0)
    mask = np.asarray(mask_2d)[..., None]

    def log_snr(t):
        return float(gd.log_snr(jnp.float32(t)))

    def alpha_sigma(t):
        ls = log_snr(t)
        return np.sqrt(1 / (1 + np.exp(-ls))), np.sqrt(1 / (1 + np.exp(ls)))

    # mirror the jax loop's RNG stream exactly
    key = jax.random.PRNGKey(7)
    key, init_key = jax.random.split(key)
    x = np.asarray(jax.random.normal(init_key, shape, jnp.float32))

    times = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float32)
    x0_prev = np.zeros(shape, np.float32)
    lam_prev = 0.5 * log_snr(1.0)
    is_first = True
    for i in range(num_steps):
        t, t_next = float(times[i]), float(times[i + 1])
        for r in range(resample_times):
            key, k1, k2, k3 = jax.random.split(key, 4)
            tb = jnp.full((1,), t, jnp.float32)
            noised = np.asarray(
                gd.q_sample(known, tb, jax.random.normal(k1, shape, jnp.float32))[0]
            )
            x = x * (1.0 - mask) + noised * mask
            # --- dpmpp 2M update (numpy transcription) ---
            x0 = np.broadcast_to(target, x.shape)  # oracle; threshold no-op
            lam = 0.5 * log_snr(t)
            lam_next = 0.5 * log_snr(t_next)
            h = lam_next - lam
            _, sigma = alpha_sigma(t)
            alpha_next, sigma_next = alpha_sigma(t_next)
            h_prev = lam - lam_prev
            if is_first or i == num_steps - 1 or abs(h_prev) < 1e-8:
                d = x0
            else:
                rr = h_prev / h
                d = (1 + 1 / (2 * rr)) * x0 - (1 / (2 * rr)) * x0_prev
            x = (sigma_next / sigma) * x - alpha_next * np.expm1(-h) * d
            x0_prev, lam_prev, is_first = x0, lam, False
            # --- renoise back to t for all but the last round ---
            if r < resample_times - 1 and t_next > 0:
                x = np.asarray(
                    gd.q_sample_from_to(
                        jnp.asarray(x),
                        jnp.full((1,), t_next, jnp.float32),
                        tb,
                        jax.random.normal(k3, shape, jnp.float32),
                    )
                )
    x = x * (1.0 - mask) + np.asarray(known) * mask
    ref = np.clip(x, -1, 1)

    out = dpmpp_sample_loop(
        gd, _oracle_denoiser(gd, jnp.asarray(target)), shape,
        jax.random.PRNGKey(7), objective="noise", num_steps=num_steps,
        inpaint_images=known, inpaint_masks=mask_2d,
        inpaint_resample_times=resample_times,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)
