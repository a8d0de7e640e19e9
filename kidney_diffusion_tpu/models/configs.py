"""Declarative cascade configurations for every reference variant.

The reference duplicates `unet_generator` + `init_imagen` across seven
training scripts (/root/reference/train.py:28-112,
train_uncond.py:28-93, train_ultra_res.py:27-92, train_ultra_res_v2.py,
train_ultra_res_v_param.py, train_ultra_res_airs.py:23-88,
train_kumar.py:27-97). Here each variant is a single data value.

A `CascadeConfig` fully describes an Imagen-equivalent: per-stage U-Net
configs, image sizes, timesteps, objectives, random-crop training sizes,
and conditioning mode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

from ..core.elucidated import EDMConfig
from .unet import UNetConfig


@dataclasses.dataclass(frozen=True)
class StageConfig:
    unet: UNetConfig
    image_size: int
    timesteps: int
    pred_objective: str = "noise"  # "noise" | "v" | "x_start"
    random_crop_size: Optional[int] = None
    noise_schedule: str = "cosine"
    sampler: str = "ddpm"  # "ddpm" | "edm" (ElucidatedImagen)
    edm: Optional["EDMConfig"] = None  # required when sampler == "edm"

    @property
    def lowres_cond(self) -> bool:
        return self.unet.lowres_cond


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Whole-cascade description (the Imagen-object equivalent)."""

    name: str
    stages: Tuple[StageConfig, ...]
    text_embed_dim: Optional[int] = None
    condition_on_text: bool = False
    cond_drop_prob: float = 0.1
    channels: int = 3
    # super-res noise-conditioning augmentation
    lowres_sample_noise_level: float = 0.2
    lowres_max_aug_level: float = 0.999
    lowres_noise_schedule: str = "linear"

    @property
    def num_stages(self) -> int:
        return len(self.stages)

    def stage(self, unet_number: int) -> StageConfig:
        """1-indexed, mirroring the reference's `unet_number` convention."""
        return self.stages[unet_number - 1]


# ---------------------------------------------------------------------------
# shared stage shapes
# ---------------------------------------------------------------------------


def _base_unet(
    *,
    dim_mults=(1, 2, 4, 8),
    cond_dim=None,
    text_embed_dim=None,
    cond_images_channels=0,
) -> UNetConfig:
    """64² base stage (reference `unet_number == 1`)."""
    return UNetConfig(
        dim=256,
        dim_mults=dim_mults,
        cond_dim=cond_dim,
        text_embed_dim=text_embed_dim,
        num_resnet_blocks=3,
        layer_attns=(False, True, True, True),
        layer_cross_attns=(False, True, True, True),
        cond_images_channels=cond_images_channels,
        lowres_cond=False,
    )


def _sr256_unet(*, cond_dim=None, text_embed_dim=None, cond_images_channels=0) -> UNetConfig:
    """64->256 super-res stage (reference `unet_number == 2`)."""
    return UNetConfig(
        dim=128,
        dim_mults=(1, 2, 4, 8),
        cond_dim=cond_dim,
        text_embed_dim=text_embed_dim,
        num_resnet_blocks=2,
        memory_efficient=True,
        layer_attns=(False, False, False, True),
        layer_cross_attns=(False, False, True, True),
        init_conv_to_final_conv_residual=True,
        cond_images_channels=cond_images_channels,
        lowres_cond=True,
    )


def _sr1024_unet(
    *,
    num_resnet_blocks=(2, 4, 4, 4),
    cond_dim=None,
    text_embed_dim=None,
    cond_images_channels=0,
) -> UNetConfig:
    """256->1024 super-res stage (reference `unet_number == 3`)."""
    return UNetConfig(
        dim=128,
        dim_mults=(1, 2, 4, 8),
        cond_dim=cond_dim,
        text_embed_dim=text_embed_dim,
        num_resnet_blocks=num_resnet_blocks,
        memory_efficient=True,
        layer_attns=False,
        layer_cross_attns=(False, False, False, True),
        init_conv_to_final_conv_residual=True,
        cond_images_channels=cond_images_channels,
        lowres_cond=True,
        # batch-of-row-chunks execution: keeps the big spatial convs out
        # of XLA's space-to-batch pass (105.7 -> 77.3 ms/fwd at 1024² at
        # chunks=8, PERF.md round 2; 75.8 ms at chunks=16, round 3 —
        # re-confirmed in the same harness); exact same function
        # (tests/test_unet.py, incl. the 1-row-deepest-level topology the
        # 256² training crop produces at chunks=16)
        spatial_chunks=16,
    )


# ---------------------------------------------------------------------------
# variant factories
# ---------------------------------------------------------------------------


def patch_conditioned() -> CascadeConfig:
    """Metadata + 4-ch labelmap conditioned 64->256->1024 cascade
    (/root/reference/train.py:28-95)."""
    kw = dict(cond_dim=512, text_embed_dim=3, cond_images_channels=4)
    return CascadeConfig(
        name="patch_conditioned",
        stages=(
            StageConfig(_base_unet(dim_mults=(1, 2, 3, 4), **kw), 64, 1024, "noise"),
            StageConfig(_sr256_unet(**kw), 256, 256, "v"),
            StageConfig(_sr1024_unet(**kw), 1024, 256, "v", random_crop_size=256),
        ),
        text_embed_dim=3,
        condition_on_text=True,
    )


def patch_unconditional() -> CascadeConfig:
    """Unconditional patch cascade (/root/reference/train_uncond.py:28-93)."""
    kw = dict(cond_dim=512)
    return CascadeConfig(
        name="patch_unconditional",
        stages=(
            StageConfig(_base_unet(**kw), 64, 1024, "noise"),
            StageConfig(_sr256_unet(**kw), 256, 256, "noise"),
            StageConfig(_sr1024_unet(**kw), 1024, 256, "noise", random_crop_size=256),
        ),
        condition_on_text=False,
    )


_ULTRA_RES_VARIANTS = {
    # version: (base dim_mults, sr1024 blocks, objectives, cond channels for mag>0)
    "v1": ((1, 2, 4, 8), (2, 4, 6, 8), ("noise", "noise", "noise"), 3),
    "v2": ((1, 2, 4, 8), (2, 4, 6, 8), ("noise", "noise", "noise"), 6),
    "v_param": ((1, 2, 3, 4), (2, 4, 6, 8), ("noise", "v", "v"), 3),
    "airs": ((1, 2, 3, 4), (2, 4, 6, 8), ("v", "v", "v"), 3),
}


def ultra_res(magnification_level: int, version: str = "v1") -> CascadeConfig:
    """Ultra-res cascade for one magnification level
    (/root/reference/train_ultra_res.py:27-92 and the v2 / v_param / airs
    variants; version dispatch mirrors sample_ultra_res.py:37-44)."""
    if version not in _ULTRA_RES_VARIANTS:
        raise ValueError(f"unknown ultra-res version {version!r}")
    base_mults, sr1024_blocks, objectives, cond_ch = _ULTRA_RES_VARIANTS[version]
    cc = cond_ch if magnification_level > 0 else 0
    return CascadeConfig(
        name=f"ultra_res_{version}_mag{magnification_level}",
        stages=(
            StageConfig(
                _base_unet(dim_mults=base_mults, cond_images_channels=cc),
                64, 1024, objectives[0],
            ),
            StageConfig(_sr256_unet(cond_images_channels=cc), 256, 256, objectives[1]),
            StageConfig(
                _sr1024_unet(num_resnet_blocks=sr1024_blocks, cond_images_channels=cc),
                1024, 256, objectives[2], random_crop_size=256,
            ),
        ),
        condition_on_text=False,
    )


def kumar() -> CascadeConfig:
    """Two-stage nuclei cascade conditioned on a binary mask + 2-float
    metadata (/root/reference/train_kumar.py:27-97). The reference has a
    latent text-dim inconsistency (unet says 3, Imagen says 2 —
    train_kumar.py:33 vs :78); we use 2 consistently."""
    kw = dict(cond_dim=512, text_embed_dim=2, cond_images_channels=1)
    return CascadeConfig(
        name="kumar",
        stages=(
            StageConfig(_base_unet(dim_mults=(1, 2, 3, 4), **kw), 64, 1000, "noise"),
            StageConfig(_sr256_unet(**kw), 256, 1000, "noise"),
        ),
        text_embed_dim=2,
        condition_on_text=True,
    )


def elucidated(
    config: CascadeConfig,
    *,
    num_sample_steps: Sequence[int] = (32, 128, 128),
    sigma_max: Sequence[float] = (80.0, 320.0, 1280.0),
    sigma_min: float = 0.002,
) -> CascadeConfig:
    """Switch a cascade to the EDM/Karras sampler — the reference's
    commented-out ElucidatedImagen configuration
    (/root/reference/train.py:97-110: num_sample_steps=(32,128,128),
    sigma_min=0.002, sigma_max=(80,320,1280), cond_drop_prob=0.1)."""
    stages = tuple(
        dataclasses.replace(
            st,
            sampler="edm",
            edm=EDMConfig(
                num_sample_steps=num_sample_steps[i],
                sigma_min=sigma_min,
                sigma_max=sigma_max[i],
            ),
        )
        for i, st in enumerate(config.stages)
    )
    return dataclasses.replace(
        config, name=config.name + "_elucidated", stages=stages
    )


_REGISTRY = {
    "patch_conditioned": lambda **kw: patch_conditioned(),
    "patch_unconditional": lambda **kw: patch_unconditional(),
    "ultra_res": lambda **kw: ultra_res(**kw),
    "kumar": lambda **kw: kumar(),
}


def get_cascade(name: str, **kwargs) -> CascadeConfig:
    if name not in _REGISTRY:
        raise KeyError(f"unknown cascade {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def tiny_test_cascade(
    *,
    num_stages: int = 2,
    condition_on_text: bool = False,
    cond_images_channels: int = 0,
    objectives: Tuple[str, ...] = ("noise", "v"),
    image_sizes: Tuple[int, ...] = (16, 32),
    timesteps: int = 8,
) -> CascadeConfig:
    """Miniature cascade for CPU tests: same topology, toy dims."""
    text_dim = 3 if condition_on_text else None
    stages = []
    for i in range(num_stages):
        stages.append(
            StageConfig(
                UNetConfig(
                    dim=16,
                    dim_mults=(1, 2),
                    cond_dim=16,
                    text_embed_dim=text_dim,
                    num_resnet_blocks=1,
                    layer_attns=(False, True),
                    layer_cross_attns=(False, True),
                    memory_efficient=i > 0,
                    init_conv_to_final_conv_residual=i > 0,
                    cond_images_channels=cond_images_channels,
                    lowres_cond=i > 0,
                    attn_heads=2,
                    attn_dim_head=8,
                    dtype="float32",
                ),
                image_sizes[i],
                timesteps,
                objectives[i],
            )
        )
    return CascadeConfig(
        name="tiny_test",
        stages=tuple(stages),
        text_embed_dim=text_dim,
        condition_on_text=condition_on_text,
    )


def serving_overrides(
    config: "CascadeConfig",
    *,
    quant: Optional[str] = None,
    storage: Optional[str] = None,
    min_image_size: int = 512,
) -> "CascadeConfig":
    """Serving-time performance overrides: apply the w8a8 int8 conv path
    (`quant="int8"`) and/or narrow activation storage
    (`storage="float8_e4m3fn"`) to every stage at or above
    `min_image_size` — the bandwidth/compute-heavy super-res stages
    where they pay (PERF.md round 3: flagship stage-3 denoise step
    79 -> 56.4 ms with both). Checkpoints are unchanged: weights
    quantize in-graph from the bf16 params. A quality/speed trade —
    see artifacts/r3_quant for the measured FID cost."""
    if not quant and not storage:
        return config
    stages = tuple(
        dataclasses.replace(
            st,
            unet=dataclasses.replace(
                st.unet, quant_conv=quant, storage_dtype=storage
            ),
        )
        if st.image_size >= min_image_size
        else st
        for st in config.stages
    )
    return dataclasses.replace(config, stages=stages)
