"""Mesh + sharding helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "row") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def row_sharding(mesh: Mesh, row_axis_index: int, ndim: int) -> NamedSharding:
    """Shard a given axis over the mesh 'row' axis, replicate the rest."""
    spec = [None] * ndim
    spec[row_axis_index] = "row"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
