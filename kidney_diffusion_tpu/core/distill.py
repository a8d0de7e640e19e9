"""Progressive distillation (Salimans & Ho 2022, arXiv:2202.00512).

Halves the number of sampler steps a trained diffusion model needs:
a *student* (initialised from the teacher) is trained so that ONE of its
DDIM steps matches TWO consecutive DDIM steps of the *teacher* on the
student's sampling grid. Applied iteratively (N -> N/2 -> ... -> 4-8
steps), this turns the reference's 256-step ancestral sampler class
into a few-step serving model at matched sample quality — a serving
capability beyond the reference's surface (imagen-pytorch has only the
ancestral loop; /root/reference/sample_ultra_res.py:183-195 pays
`timesteps × resample` model evaluations per patch).

TPU-first notes: the distillation loss is three forward passes (two
teacher, one student) + one backward, all under one jit — the teacher
steps are deterministic DDIM so no extra RNG enters the graph, and the
whole phase schedule (N, N/2, ...) is static per compiled step.

All math lives on the continuous-time log-SNR schedule of
`core/schedules.py`; the student's sampling grid for N steps is exactly
`linspace(1, 0, N+1)` — the same grid `ddim_sample_loop` uses — so a
distilled checkpoint is sampled with the existing `--ddim_steps N`
serving path, no new sampler needed.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .diffusion import pred_to_x_start, static_threshold
from .schedules import GaussianDiffusion, _right_pad_dims_to, log_snr_to_alpha_sigma

Array = jax.Array
DenoiseFn = Callable[[Array, Array], Array]


def ddim_step(
    diffusion: GaussianDiffusion,
    denoise_fn: DenoiseFn,
    x: Array,
    t: Array,
    t_next: Array,
    *,
    objective: str,
    clip_x0: bool = True,
) -> Array:
    """One deterministic DDIM (eta=0) step x_t -> x_{t_next}.

    The same update rule as `ddim_sample_loop`'s eta=0 branch, exposed as
    a standalone function so the teacher's two half-steps and the
    student's implied one-step share one definition (the distillation
    target inverts exactly this rule).
    """
    pred = denoise_fn(x, t).astype(jnp.float32)
    x0 = pred_to_x_start(diffusion, x, t, pred, objective=objective)
    if clip_x0:
        x0 = static_threshold(x0)
    eps = diffusion.predict_noise_from_start(x, t, x0)
    log_snr_next = _right_pad_dims_to(x, diffusion.log_snr(t_next))
    alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)
    return alpha_next * x0 + sigma_next * eps


def distill_target_x0(
    diffusion: GaussianDiffusion,
    teacher_fn: DenoiseFn,
    x_t: Array,
    t: Array,
    t_mid: Array,
    t_next: Array,
    *,
    teacher_objective: str,
    clip_x0: bool = True,
) -> Tuple[Array, Array]:
    """x0-space target for the student at (x_t, t).

    Runs the teacher two DDIM steps t -> t_mid -> t_next to get z_next,
    then solves the one-step DDIM update
        z_next = alpha' * x0 + sigma'/sigma * (x_t - alpha * x0)
    for the x0 a student would have to predict at (x_t, t) for its
    single step to land exactly on z_next (arXiv:2202.00512 Algorithm 2).
    Returns (x0_target, z_next); gradients do not flow into the teacher
    (the caller passes teacher params outside the diff'd argument).
    """
    z_mid = ddim_step(
        diffusion, teacher_fn, x_t, t, t_mid,
        objective=teacher_objective, clip_x0=clip_x0,
    )
    z_next = ddim_step(
        diffusion, teacher_fn, z_mid, t_mid, t_next,
        objective=teacher_objective, clip_x0=clip_x0,
    )
    log_snr = _right_pad_dims_to(x_t, diffusion.log_snr(t))
    log_snr_next = _right_pad_dims_to(x_t, diffusion.log_snr(t_next))
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)
    ratio = sigma_next / jnp.clip(sigma, min=1e-8)
    # alpha_next > ratio * alpha strictly for t_next < t (SNR increases as
    # t decreases), so the denominator is positive and bounded away from 0
    # on any real sampling grid.
    denom = jnp.clip(alpha_next - ratio * alpha, min=1e-8)
    x0_target = (z_next - ratio * x_t) / denom
    x0_target = jax.lax.stop_gradient(x0_target)
    return x0_target, z_next


def student_time_grid(
    key: Array, batch: int, num_student_steps
) -> Tuple[Array, Array, Array]:
    """Sample (t, t_mid, t_next) on the student's N-step grid.

    t = i/N with i ~ U{1..N}; the teacher runs two half-steps of 1/(2N).
    `num_student_steps` may be a TRACED int32 scalar — the phase
    schedule (N, N/2, ...) then reuses ONE compiled step, which matters
    on the 631M flagship stage where each retrace is a multi-minute
    remote compile.
    """
    n_i = jnp.asarray(num_student_steps, jnp.int32)
    n = n_i.astype(jnp.float32)
    i = jax.random.randint(key, (batch,), 1, n_i + 1).astype(jnp.float32)
    t = i / n
    return t, t - 0.5 / n, t - 1.0 / n


def progressive_distill_loss(
    diffusion: GaussianDiffusion,
    teacher_fn: DenoiseFn,
    student_fn: DenoiseFn,
    x_start: Array,
    key: Array,
    noise: Array,
    *,
    num_student_steps: int,
    teacher_objective: str,
    student_objective: str,
    clip_x0: bool = True,
) -> Array:
    """Per-example progressive-distillation loss, shape (batch,).

    The error space follows the STUDENT's parameterisation — the loss
    must be computed on the quantity the network actually outputs, or
    the parameterisation conversion amplifies it without bound at one
    end of the grid:

    * v / x_start students: truncated-SNR weighting of arXiv:2202.00512
      §4, w(t) = max(1, SNR) on the x0-space error (computed as the
      pointwise max of the x0- and eps-space squared errors; identical
      by eps_err = -(alpha/sigma) * x0_err). x0_pred is bounded for
      these parameterisations, so the weight's t->1 limit (1) is fine.
    * eps ("noise") students: plain eps-space error, algebraically
      SNR * x0_err^2 — the same weighting the stage was trained under
      (eps-MSE). Truncated-SNR is DIVERGENT here: at t = 1 the fp32
      cosine schedule has alpha ~ 4e-8, so the implied
      x0_pred = (x_t - sigma * eps_pred) / alpha amplifies eps error by
      ~2e7 and max(1, SNR) keeps weight 1 on it — measured as a phase-8
      distill "loss" of 5.7e9 (eps error actually ~3e-3) whose clipped
      gradients were dominated by the t = 1 lattice point in ~65% of
      batches, starving every other step of the 8-step grid.
    """
    x_start = x_start.astype(jnp.float32)
    t, t_mid, t_next = student_time_grid(key, x_start.shape[0], num_student_steps)
    x_t, _, alpha, sigma = diffusion.q_sample(x_start, t, noise)

    x0_tgt, _ = distill_target_x0(
        diffusion, teacher_fn, x_t, t, t_mid, t_next,
        teacher_objective=teacher_objective, clip_x0=clip_x0,
    )

    pred = student_fn(x_t, t).astype(jnp.float32)

    if student_objective == "noise":
        # x0_tgt carries stop_gradient; x_t does not depend on student
        # params, so gradients flow only through `pred`.
        eps_tgt = diffusion.predict_noise_from_start(x_t, t, x0_tgt)
        err2 = (pred - eps_tgt) ** 2
    else:
        x0_pred = pred_to_x_start(diffusion, x_t, t, pred, objective=student_objective)
        x0_err2 = (x0_pred - x0_tgt) ** 2
        snr = (alpha / jnp.clip(sigma, min=1e-8)) ** 2
        err2 = jnp.maximum(x0_err2, snr * x0_err2)  # = max(1, SNR) * x0_err2
    return jnp.mean(err2, axis=tuple(range(1, x_start.ndim)))
