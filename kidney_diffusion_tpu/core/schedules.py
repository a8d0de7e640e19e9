"""Continuous-time Gaussian diffusion schedules (log-SNR formulation).

The reference delegates its forward process to imagen-pytorch's
continuous-time Gaussian diffusion (used from e.g.
/root/reference/train.py:84-95 via `Imagen(timesteps=..., pred_objectives=...)`).
This module re-derives the same math as pure, jittable JAX functions:

  * log-SNR schedules ("cosine", "linear")
  * q(x_t | x_0)            — `q_sample`
  * q(x_s | x_t, x_0)       — `q_posterior` (s < t)
  * eps / v / x0 conversions
  * re-noising between arbitrary times — `q_sample_from_to` (RePaint)

All computation is float32 regardless of model compute dtype; schedule
math is numerically delicate and cheap.

Conventions: continuous time t ∈ [0, 1]; t=0 is clean data, t=1 is pure
noise. Sampling discretises [1, 0] into `num_timesteps` pairs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _right_pad_dims_to(x: Array, t: Array) -> Array:
    """Broadcast a per-batch scalar `t` against image-shaped `x`."""
    pad = x.ndim - t.ndim
    if pad <= 0:
        return t
    return t.reshape(t.shape + (1,) * pad)


def cosine_log_snr(t: Array, s: float = 0.008, eps: float = 1e-5) -> Array:
    """log SNR for the cosine schedule: alpha_bar(t) = cos²(((t+s)/(1+s))·π/2)."""
    arg = jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2
    return -jnp.log(jnp.clip(arg - 1.0, min=eps))


def linear_log_snr(t: Array) -> Array:
    """log SNR for the (continuous) linear-beta schedule."""
    return -jnp.log(jnp.expm1(1e-4 + 10.0 * t**2))


_LOG_SNR_FNS = {
    "cosine": cosine_log_snr,
    "linear": linear_log_snr,
}


def log_snr_to_alpha_sigma(log_snr: Array) -> Tuple[Array, Array]:
    """alpha = sqrt(sigmoid(log_snr)), sigma = sqrt(sigmoid(-log_snr))."""
    return (
        jnp.sqrt(jax.nn.sigmoid(log_snr)),
        jnp.sqrt(jax.nn.sigmoid(-log_snr)),
    )


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Continuous-time diffusion process with a fixed number of sampling steps.

    `num_timesteps` only affects the sampling discretisation (and the step
    size of `q_posterior`); training times are continuous U(0, 1).
    """

    num_timesteps: int = 1000
    schedule: str = "cosine"

    def __post_init__(self):
        if self.schedule not in _LOG_SNR_FNS:
            raise ValueError(f"unknown schedule {self.schedule!r}")

    # ---- schedule -------------------------------------------------------

    def log_snr(self, t: Array) -> Array:
        return _LOG_SNR_FNS[self.schedule](jnp.asarray(t, jnp.float32))

    def alpha_sigma(self, t: Array) -> Tuple[Array, Array]:
        return log_snr_to_alpha_sigma(self.log_snr(t))

    # ---- times ----------------------------------------------------------

    def sample_random_times(self, key: Array, batch: int) -> Array:
        """Continuous training times t ~ U(0, 1), shape (batch,)."""
        return jax.random.uniform(key, (batch,), jnp.float32, 0.0, 1.0)

    def sampling_time_pairs(self) -> Array:
        """(num_timesteps, 2) array of (t, t_next) pairs, from t=1 down to 0."""
        times = jnp.linspace(1.0, 0.0, self.num_timesteps + 1, dtype=jnp.float32)
        return jnp.stack([times[:-1], times[1:]], axis=-1)

    # ---- forward process -------------------------------------------------

    def q_sample(
        self, x_start: Array, t: Array, noise: Array
    ) -> Tuple[Array, Array, Array, Array]:
        """Diffuse clean data to time t. Returns (x_t, log_snr, alpha, sigma)."""
        log_snr = self.log_snr(t)
        log_snr_p = _right_pad_dims_to(x_start, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr_p)
        x_t = alpha * x_start.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
        return x_t, log_snr, alpha, sigma

    def q_sample_from_to(
        self, x_from: Array, from_t: Array, to_t: Array, noise: Array
    ) -> Array:
        """Re-noise a sample from time `from_t` to a *later* time `to_t` > `from_t`.

        Used by RePaint-style inpainting resampling: after a reverse step
        t -> s, jump back to t by adding the right amount of fresh noise.
        """
        x_from = x_from.astype(jnp.float32)
        log_snr_from = _right_pad_dims_to(x_from, self.log_snr(from_t))
        log_snr_to = _right_pad_dims_to(x_from, self.log_snr(to_t))
        alpha_from, sigma_from = log_snr_to_alpha_sigma(log_snr_from)
        alpha_to, sigma_to = log_snr_to_alpha_sigma(log_snr_to)
        # x_to = (alpha_to/alpha_from)·x_from + sigma(to|from)·noise with the
        # marginal-preserving bridge variance.
        var = jnp.clip(sigma_to**2 - (alpha_to / alpha_from) ** 2 * sigma_from**2, min=0.0)
        return x_from * (alpha_to / alpha_from) + jnp.sqrt(var) * noise

    # ---- posterior q(x_s | x_t, x_0), s = t_next < t ----------------------

    def q_posterior(
        self, x_start: Array, x_t: Array, t: Array, t_next: Array
    ) -> Tuple[Array, Array, Array]:
        """Mean / variance / log-variance of q(x_{t_next} | x_t, x_0)."""
        log_snr = _right_pad_dims_to(x_t, self.log_snr(t))
        log_snr_next = _right_pad_dims_to(x_t, self.log_snr(t_next))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)

        # c = 1 - SNR(t)/SNR(t_next)
        c = -jnp.expm1(log_snr - log_snr_next)
        mean = alpha_next * (x_t * (1.0 - c) / alpha + c * x_start)
        variance = sigma_next**2 * c
        log_variance = jnp.log(jnp.clip(variance, min=1e-20))
        return mean, variance, log_variance

    # ---- parameterisation conversions -------------------------------------

    def predict_start_from_noise(self, x_t: Array, t: Array, noise: Array) -> Array:
        log_snr = _right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - sigma * noise) / jnp.clip(alpha, min=1e-8)

    def predict_start_from_v(self, x_t: Array, t: Array, v: Array) -> Array:
        log_snr = _right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * x_t - sigma * v

    def predict_noise_from_start(self, x_t: Array, t: Array, x0: Array) -> Array:
        log_snr = _right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - alpha * x0) / jnp.clip(sigma, min=1e-8)

    def calculate_v(self, x_start: Array, t: Array, noise: Array) -> Array:
        log_snr = _right_pad_dims_to(x_start, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * noise - sigma * x_start
