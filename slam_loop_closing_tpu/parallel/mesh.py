"""Device-mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (0 = all). The single
    parallel axis is data parallelism over frames / pairs; a v5e-8 slice maps
    this onto the ICI ring."""
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, x: jax.Array, axis: str = "data") -> jax.Array:
    """Place ``x`` with its leading dimension sharded over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, x: jax.Array) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x, m: int, axis: int = 0):
    """Pad a leading axis to a multiple of ``m`` (shard-evenly requirement).
    Returns (padded, original_size)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n
