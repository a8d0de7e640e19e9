"""kidney_diffusion_tpu — a TPU-native cascaded-diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
jameshball/kidney-diffusion (reference at /root/reference): cascaded
Imagen-style diffusion for histopathology patches up to gigapixel
whole-slide images, plus the AIRS aerial and Kumar nuclei variants.

Layout
------
core/      continuous-time Gaussian diffusion math, samplers (DDPM/DDIM/EDM)
models/    efficient U-Net (Flax), model configs for every reference variant
kernels/   Pallas TPU kernels for the hot ops
ops/       image ops (HSV, morphology, resize, recentering) as jittable fns
parallel/  mesh construction + sharding rules
train/     Trainer (optax/EMA/orbax), per-stage training
sample/    cascade driver, gigapixel wavefront orchestrator, outpainting
data/      WSI geometry, index-encoded augmentation, datasets, host pipeline
eval/      FID (InceptionV3 in Flax) + paired patch samplers
cli/       command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
