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


def shard_env_map(mesh: Mesh, fn, axis=None):
    """Wraps a batched env function (every argument/result a pytree whose
    leaves carry a leading env-batch axis) in ``shard_map`` so each device
    executes ``fn`` on ONLY its local env shard.

    This is the load-bearing piece of the multi-chip design: under plain
    ``jit`` GSPMD, batch-wide *predicates* inside the step — the Newton
    solver's vmapped ``while_loop`` convergence test (physics/solver.py)
    and the amortized-autoreset ``any(needs_reset)`` (rl/batch_env.py) —
    lower to a ``pred[] all-reduce`` across every device on EVERY
    iteration, serializing the whole mesh on its slowest member.  Env
    stepping is embarrassingly parallel, so inside ``shard_map`` those
    reductions stay device-local and the compiled step contains ZERO
    cross-device collectives (asserted by ``__graft_entry__``'s dryrun).
    """
    spec = P(mesh.axis_names if axis is None else axis)
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pre-0.6 fallback
        from jax.experimental.shard_map import shard_map
    # check_vma=False: the step closes over replicated model constants and
    # seeds loop carries from broadcast zeros; the varying-axes checker
    # rejects that mix even though every output is genuinely per-shard
    return shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec,
                     check_vma=False)
