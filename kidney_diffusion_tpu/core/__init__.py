from .schedules import (
    GaussianDiffusion,
    cosine_log_snr,
    linear_log_snr,
    log_snr_to_alpha_sigma,
)
from .diffusion import (
    diffusion_loss,
    sample_loop,
    ddim_sample_loop,
    ddpm_step,
    dynamic_threshold,
    pred_to_x_start,
    cfg_denoise_fn,
)

__all__ = [
    "GaussianDiffusion",
    "cosine_log_snr",
    "linear_log_snr",
    "log_snr_to_alpha_sigma",
    "diffusion_loss",
    "sample_loop",
    "ddim_sample_loop",
    "ddpm_step",
    "dynamic_threshold",
    "pred_to_x_start",
    "cfg_denoise_fn",
]
