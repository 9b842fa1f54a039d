"""Device-mesh construction for multi-chip / multi-host scaling.

The reference has no distributed execution of its own (SURVEY.md section 2.4:
a sequential python loop over cameras, hard-coded cuda:0).  Here parallelism
is a first-class design axis: a `jax.sharding.Mesh` with a `data` axis over
cameras/frames (the natural batch of this workload) and an optional `tile`
axis over image tiles for single-view scaling.  Gradients for the replicated
Gaussian parameters ride XLA psum collectives over ICI.

Multi-host: `initialize_distributed` wraps jax.distributed.initialize; the
same mesh code then spans all processes' devices (DCN between hosts)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op in single-process runs)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1D data mesh by default; pass shape + axis_names for (data, tile)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))
