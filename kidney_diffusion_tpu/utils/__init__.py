from .checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_metadata,
    save_checkpoint,
)

__all__ = [
    "checkpoint_exists",
    "load_checkpoint",
    "load_metadata",
    "save_checkpoint",
]
