from .checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_metadata,
    save_checkpoint,
)
from .compile_cache import enable_compilation_cache

__all__ = [
    "checkpoint_exists",
    "enable_compilation_cache",
    "load_checkpoint",
    "load_metadata",
    "save_checkpoint",
]
