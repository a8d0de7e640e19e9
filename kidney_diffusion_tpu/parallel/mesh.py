"""Device mesh construction + sharding rules.

The reference's only training-time parallelism is DDP over NCCL via HF
Accelerate (SURVEY.md §2.3; /root/reference/train.py:124-128). The
TPU-native equivalent is sharded `jax.jit` over a `Mesh`:

  * "data" axis — batch sharding; XLA inserts the gradient all-reduce
    (the DDP replacement) over ICI.
  * "model" axis — optional FSDP-style parameter/optimizer sharding for
    configurations that outgrow one chip's HBM, plus tensor-parallel
    sharding of the widest U-Net layers.

Everything is ordinary global-semantics jit: we annotate shardings and
let XLA place the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialisation (DCN across hosts, ICI within a slice).

    On TPU pods with standard env configuration a bare
    `jax.distributed.initialize()` suffices; arguments are for manual
    setups. Safe to call when already initialised. This replaces the
    reference's `accelerate launch` process topology
    (/root/reference/train.py:124-128): one Python process per host,
    global-semantics jit across all of them.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def make_mesh(
    data: int = -1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("data", "model") mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    if devices == jax.devices():
        # topology-aware placement: keep the "model" axis on the
        # fastest (innermost ICI) links
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((data, model), devices=devices)
            return Mesh(arr, ("data", "model"))
        except Exception:
            pass
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_spec() -> P:
    """Leading-axis batch sharding over the data axis."""
    return P("data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with leading-axis data sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") and x.ndim > 0 else x,
        batch,
    )


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard NHWC activations along H over a mesh axis.

    Used for single-patch super-res inference: one 1024² image's rows
    spread across chips; XLA inserts the conv halo exchanges over ICI.
    This is the honest "context/sequence parallelism" of this workload
    (SURVEY.md §5: scaling spatial extent)."""
    return NamedSharding(mesh, P(None, axis, None, None))


def fsdp_param_spec(path_unused, leaf, model_axis_size: int) -> P:
    """FSDP rule: shard a parameter's largest divisible axis over "model".

    Scalars / small vectors stay replicated. Deterministic: pick the
    largest axis whose size divides the mesh axis; ties -> lowest index.
    """
    shape = leaf.shape
    if len(shape) == 0 or model_axis_size <= 1:
        return P()
    best = -1
    best_size = 0
    for i, s in enumerate(shape):
        if s % model_axis_size == 0 and s > best_size:
            best, best_size = i, s
    if best < 0 or best_size < 2 * model_axis_size:
        return P()
    spec = [None] * len(shape)
    spec[best] = "model"
    return P(*spec)


def fsdp_shardings(mesh: Mesh, params):
    """NamedSharding pytree for FSDP parameter sharding over "model"."""
    size = mesh.shape["model"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, fsdp_param_spec(None, leaf, size)), params
    )


def replicated_shardings(mesh: Mesh, tree):
    return jax.tree.map(lambda _: replicated(mesh), tree)
