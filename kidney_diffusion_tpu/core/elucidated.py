"""Elucidated diffusion (EDM, Karras et al. 2022) — the
`ElucidatedImagen` capability (present-but-optional in the reference,
/root/reference/train.py:97-110, train_kumar.py:83-95).

Implements the preconditioned denoiser (c_skip / c_out / c_in / c_noise),
the rho-spaced sigma schedule, lognormal training-sigma sampling with
EDM loss weighting, and the stochastic-churn Heun (2nd order) sampler —
all jittable; the sampler is a single `lax.scan`.

The model interface matches the DDPM path: `raw_fn(x, t) -> prediction`
where t is the noise-conditioning input (here c_noise = log(sigma)/4),
so the same U-Nets serve both samplers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import _right_pad_dims_to

Array = jax.Array
RawFn = Callable[[Array, Array], Array]  # (x_in, c_noise[batch]) -> F(x)


@dataclasses.dataclass(frozen=True)
class EDMConfig:
    """Defaults follow imagen-pytorch's ElucidatedImagen (which follow the
    EDM paper), with sigma_max per reference usage (80 base / 320 / 1280
    for super-res stages, train.py:109)."""

    num_sample_steps: int = 32
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 80.0
    S_tmin: float = 0.05
    S_tmax: float = 50.0
    S_noise: float = 1.003

    # ---- preconditioning ------------------------------------------------

    def c_skip(self, sigma):
        return self.sigma_data**2 / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)

    def c_noise(self, sigma):
        return jnp.log(sigma) * 0.25

    def preconditioned(self, raw_fn: RawFn) -> Callable[[Array, Array], Array]:
        """D(x; sigma) = c_skip·x + c_out·F(c_in·x; c_noise)."""

        def denoise(x: Array, sigma: Array) -> Array:
            sp = _right_pad_dims_to(x, sigma)
            out = raw_fn(self.c_in(sp) * x, self.c_noise(sigma))
            return self.c_skip(sp) * x + self.c_out(sp) * out.astype(jnp.float32)

        return denoise

    # ---- schedule ---------------------------------------------------------

    def sample_schedule(self) -> Array:
        """(num_sample_steps + 1,) descending sigmas, last = 0."""
        n = self.num_sample_steps
        inv_rho = 1.0 / self.rho
        steps = jnp.arange(n, dtype=jnp.float32)
        sigmas = (
            self.sigma_max**inv_rho
            + steps / (n - 1) * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)
        ) ** self.rho
        return jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])

    def loss_weight(self, sigma: Array) -> Array:
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2

    def noise_distribution(self, key: Array, batch: int) -> Array:
        return jnp.exp(
            self.P_mean + self.P_std * jax.random.normal(key, (batch,), jnp.float32)
        )


def edm_loss(
    cfg: EDMConfig,
    raw_fn: RawFn,
    x_start: Array,
    sigmas: Array,
    noise: Array,
) -> Array:
    """Per-example weighted EDM loss; x_start in [-1, 1]."""
    x_start = x_start.astype(jnp.float32)
    sp = _right_pad_dims_to(x_start, sigmas)
    x_noisy = x_start + sp * noise.astype(jnp.float32)
    denoised = cfg.preconditioned(raw_fn)(x_noisy, sigmas)
    losses = jnp.mean(
        (denoised - x_start) ** 2, axis=tuple(range(1, x_start.ndim))
    )
    return losses * cfg.loss_weight(sigmas)


def edm_sample_loop(
    cfg: EDMConfig,
    raw_fn: RawFn,
    shape: tuple,
    key: Array,
    *,
    clamp: bool = True,
    init_image: Optional[Array] = None,
    inpaint_images: Optional[Array] = None,
    inpaint_masks: Optional[Array] = None,
    inpaint_resample_times: int = 1,
) -> Array:
    """Stochastic-churn Heun sampler as one lax.scan.

    Supports the same RePaint-style inpainting contract as the DDPM loop
    (known pixels re-noised to the current sigma each step)."""
    batch = shape[0]
    denoise = cfg.preconditioned(raw_fn)
    sigmas = cfg.sample_schedule()
    gammas = jnp.where(
        (sigmas[:-1] > cfg.S_tmin) & (sigmas[:-1] < cfg.S_tmax),
        jnp.minimum(cfg.S_churn / cfg.num_sample_steps, jnp.sqrt(2.0) - 1.0),
        0.0,
    )
    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)

    key, init_key = jax.random.split(key)
    x = (
        sigmas[0] * jax.random.normal(init_key, shape, jnp.float32)
        if init_image is None
        else init_image.astype(jnp.float32)
    )

    has_inpaint = inpaint_images is not None and inpaint_masks is not None
    if has_inpaint:
        inpaint_images = inpaint_images.astype(jnp.float32)
        mask = inpaint_masks.astype(jnp.float32)
        if mask.ndim == len(shape) - 1:
            mask = mask[..., None]
    resample_times = max(int(inpaint_resample_times), 1) if has_inpaint else 1

    def heun_step(x, sigma, sigma_next, gamma, key):
        k1, k2 = jax.random.split(key)
        eps = cfg.S_noise * jax.random.normal(k1, x.shape, jnp.float32)
        sigma_hat = sigma + gamma * sigma
        x_hat = x + jnp.sqrt(jnp.clip(sigma_hat**2 - sigma**2, min=0.0)) * eps

        sig_hat_b = jnp.full((batch,), sigma_hat, jnp.float32)
        denoised = denoise(x_hat, sig_hat_b)
        if clamp:
            denoised = jnp.clip(denoised, -1.0, 1.0)
        d = (x_hat - denoised) / sigma_hat
        x_next = x_hat + (sigma_next - sigma_hat) * d

        # 2nd-order correction except on the last step (sigma_next == 0)
        def correct(x_next):
            sig_next_b = jnp.full((batch,), sigma_next, jnp.float32)
            denoised2 = denoise(x_next, sig_next_b)
            if clamp:
                denoised2 = jnp.clip(denoised2, -1.0, 1.0)
            d2 = (x_next - denoised2) / sigma_next
            return x_hat + 0.5 * (sigma_next - sigma_hat) * (d + d2)

        return jax.lax.cond(sigma_next > 0, correct, lambda v: v, x_next)

    def step(carry, inp):
        x, key = carry
        pair, gamma = inp
        sigma, sigma_next = pair[0], pair[1]

        def body(r, carry):
            x, key = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            if has_inpaint:
                noised = inpaint_images + sigma * jax.random.normal(
                    k1, x.shape, jnp.float32
                )
                x = x * (1.0 - mask) + noised * mask
            x = heun_step(x, sigma, sigma_next, gamma, k2)
            if has_inpaint:
                renoise = jnp.logical_and(r < resample_times - 1, sigma_next > 0)
                bridge = jnp.sqrt(jnp.clip(sigma**2 - sigma_next**2, min=0.0))
                x = jnp.where(
                    renoise,
                    x + bridge * jax.random.normal(k3, x.shape, jnp.float32),
                    x,
                )
            return (x, key)

        x, key = jax.lax.fori_loop(0, resample_times, body, (x, key))
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), (pairs, gammas))
    if has_inpaint:
        x = x * (1.0 - mask) + inpaint_images * mask
    return jnp.clip(x, -1.0, 1.0) if clamp else x
