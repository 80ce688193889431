"""Device-mesh helpers for multi-chip / multi-host scaling.

The reference has no distributed layer at all (SURVEY.md section 2: no
NCCL/MPI/Gloo; its only device interaction is OSQP's internal CUDA algebra).
Here scaling is expressed the TPU-native way: a ``jax.sharding.Mesh`` over
the available devices, shardings annotated with ``NamedSharding``/``pjit``,
and XLA inserting ICI/DCN collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_distributed",
]


def make_mesh(
    axis_names: Sequence[str] = ("batch",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Create a mesh over the given (default: all) devices.

    With the default single axis ``("batch",)`` all devices form one
    data-parallel axis — the natural layout for scenario MPC where each chip
    owns an independent slice of the scenario batch and collectives only
    appear for consensus reductions.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh axis."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host startup — thin wrapper over ``jax.distributed.initialize``.

    On a multi-host TPU pod slice this must be called once per host before
    any mesh construction; single-host callers may skip it.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
