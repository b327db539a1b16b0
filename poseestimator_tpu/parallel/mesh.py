"""Mesh construction + sharding helpers (jax.sharding, XLA collectives over
ICI — no hand-rolled communication)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis: str = "dp", n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over (up to) all devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_along(mesh: Mesh, x, axis: str = "dp"):
    """Place array(s) with dim 0 sharded along ``axis``."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def replicate(mesh: Mesh, x):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)
