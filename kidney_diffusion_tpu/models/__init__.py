from .unet import EfficientUNet, NullUNet, UNetConfig
from .configs import (
    CascadeConfig,
    StageConfig,
    get_cascade,
    kumar,
    patch_conditioned,
    patch_unconditional,
    tiny_test_cascade,
    ultra_res,
)

__all__ = [
    "EfficientUNet",
    "NullUNet",
    "UNetConfig",
    "CascadeConfig",
    "StageConfig",
    "get_cascade",
    "kumar",
    "patch_conditioned",
    "patch_unconditional",
    "tiny_test_cascade",
    "ultra_res",
]
