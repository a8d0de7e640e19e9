import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kidney_diffusion_tpu.core import (
    GaussianDiffusion,
    cosine_log_snr,
    linear_log_snr,
    log_snr_to_alpha_sigma,
)


def test_cosine_log_snr_closed_form():
    # alpha_bar(t) = cos²(((t+s)/(1+s))·π/2); log SNR = log(alpha_bar/(1-alpha_bar))
    s = 0.008
    t = np.linspace(0.01, 0.95, 17)
    alpha_bar = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    expected = np.log(alpha_bar / (1 - alpha_bar))
    got = np.asarray(cosine_log_snr(jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_alpha_sigma_variance_preserving():
    for fn in (cosine_log_snr, linear_log_snr):
        t = jnp.linspace(0.0, 1.0, 33)
        alpha, sigma = log_snr_to_alpha_sigma(fn(t))
        np.testing.assert_allclose(np.asarray(alpha**2 + sigma**2), 1.0, atol=1e-6)


def test_log_snr_monotone_decreasing():
    t = jnp.linspace(0.001, 0.999, 100)
    for fn in (cosine_log_snr, linear_log_snr):
        ls = np.asarray(fn(t))
        assert np.all(np.diff(ls) < 0)


def test_q_sample_statistics():
    gd = GaussianDiffusion(num_timesteps=100, schedule="cosine")
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 8, 8, 3)) * 0.5
    noise = jax.random.normal(key, x0.shape)
    t = jnp.full((4,), 0.5)
    x_t, log_snr, alpha, sigma = gd.q_sample(x0, t, noise)
    expected = np.asarray(alpha * x0 + sigma * noise)
    np.testing.assert_allclose(np.asarray(x_t), expected, rtol=1e-5)


def test_parameterisation_roundtrips():
    gd = GaussianDiffusion(num_timesteps=100)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.uniform(k1, (2, 8, 8, 3), minval=-1, maxval=1)
    noise = jax.random.normal(k2, x0.shape)
    t = jnp.array([0.3, 0.7])

    x_t, *_ = gd.q_sample(x0, t, noise)

    # eps-param roundtrip
    x0_hat = gd.predict_start_from_noise(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)

    # v-param roundtrip
    v = gd.calculate_v(x0, t, noise)
    x0_hat_v = gd.predict_start_from_v(x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_hat_v), np.asarray(x0), atol=1e-4)

    # noise recovery from x0
    eps_hat = gd.predict_noise_from_start(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-4)


def test_q_posterior_terminal_consistency():
    # As t_next -> t the posterior mean must approach x_t.
    gd = GaussianDiffusion(num_timesteps=1000)
    key = jax.random.PRNGKey(2)
    x0 = jax.random.uniform(key, (2, 4, 4, 3), minval=-1, maxval=1)
    noise = jax.random.normal(key, x0.shape)
    t = jnp.array([0.5, 0.5])
    x_t, *_ = gd.q_sample(x0, t, noise)
    mean, var, _ = gd.q_posterior(x0, x_t, t, t - 1e-6)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x_t), atol=1e-3)
    assert np.all(np.asarray(var) < 1e-4)


def test_q_sample_from_to_marginal():
    # Renoising from t_next to t must reproduce the marginal q(x_t | x0).
    gd = GaussianDiffusion(num_timesteps=100)
    key = jax.random.PRNGKey(3)
    n = 20000
    x0 = jnp.zeros((n, 1, 1, 1))
    k1, k2 = jax.random.split(key)
    t_next = jnp.full((n,), 0.4)
    t = jnp.full((n,), 0.6)
    x_next, *_ = gd.q_sample(x0, t_next, jax.random.normal(k1, x0.shape))
    x_t = gd.q_sample_from_to(x_next, t_next, t, jax.random.normal(k2, x0.shape))
    # marginal std at t=0.6 for x0=0 is sigma(0.6)
    _, sigma = gd.alpha_sigma(jnp.asarray(0.6))
    emp_std = float(jnp.std(x_t))
    assert abs(emp_std - float(sigma)) < 0.02


def test_sampling_time_pairs():
    gd = GaussianDiffusion(num_timesteps=16)
    pairs = np.asarray(gd.sampling_time_pairs())
    assert pairs.shape == (16, 2)
    assert pairs[0, 0] == 1.0
    assert pairs[-1, 1] == 0.0
    # contiguity
    np.testing.assert_allclose(pairs[1:, 0], pairs[:-1, 1])


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        GaussianDiffusion(schedule="nope")
