"""Mesh + sharding helpers (jax.sharding, ICI-aware device ordering)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a 1-D data-parallel mesh.

    Uses mesh_utils.create_device_mesh so device order follows the physical
    ICI topology when running on a real slice.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    try:
        dev_array = mesh_utils.create_device_mesh((n,), devices=devices)
    except Exception:
        dev_array = np.asarray(devices)
    return Mesh(dev_array, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the global batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated values (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array in a batch pytree with its leading axis sharded
    over the data mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
