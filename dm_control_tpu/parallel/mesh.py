"""Mesh construction and batch sharding helpers.

The canonical layout for this framework:

- mesh axes ``("env",)`` — pure env/data parallelism (each device steps its
  env shard; the learner is data-parallel over the same axis), or
  ``("host", "env")`` on multi-host pods so host-local env shards never
  cross DCN;
- env-batch pytrees sharded along their leading axis with NamedSharding;
- learner parameters replicated; XLA inserts psum/all-gather over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "env",
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the fastest available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Sharding that splits the leading (env) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "env"):
    """Places a batched pytree with its leading axis split over the mesh.

    Scalar leaves (or leaves whose leading dim is not divisible) are
    replicated.
    """
    n = mesh.devices.size
    shard = env_sharding(mesh, axis)
    repl = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)
