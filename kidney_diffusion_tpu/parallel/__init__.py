from .mesh import (
    batch_sharding,
    batch_spec,
    fsdp_param_spec,
    fsdp_shardings,
    make_mesh,
    replicated,
    replicated_shardings,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "batch_spec",
    "fsdp_param_spec",
    "fsdp_shardings",
    "make_mesh",
    "replicated",
    "replicated_shardings",
    "shard_batch",
]

from .mesh import initialize_distributed  # noqa: E402

__all__.append("initialize_distributed")
