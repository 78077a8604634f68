"""Multi-host distributed runtime (SURVEY §2.10 TPU-native column).

The reference's only cross-process machinery is multiprocessing pipes
(dm_control/scripts/vec_env.py:433-445).  The TPU-native replacement:

- one JAX process per host, joined with ``jax.distributed.initialize``;
- a ('host', 'env') mesh whose host axis maps to DCN and whose env axis
  maps to the host-local devices over ICI — env batches are sharded over
  BOTH axes (each device owns batch/n_total envs), so stepping never
  crosses DCN and learner gradient psums ride ICI first;
- host-local array construction via
  ``jax.make_array_from_process_local_data`` so each host materializes
  only its own env shard.

Single-process (incl. the driver's virtual-device CPU mesh) uses the
same code path: process_count == 1 simply makes the host axis length 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Joins this process to the distributed runtime.

    On TPU pods all arguments are inferred from the environment; on other
    platforms pass the coordinator's host:port plus this process's rank.
    No-op if the distributed runtime is already initialized.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError:
        # single-process usage without a coordinator: nothing to join
        if coordinator_address is not None:
            raise


def pod_mesh(host_axis: str = "host", env_axis: str = "env",
             devices: Optional[Sequence] = None) -> Mesh:
    """('host', 'env') mesh: rows = processes (DCN), cols = each host's
    local devices (ICI)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n_local = max(1, devices.size // max(1, jax.process_count()))
    grid = devices.reshape(devices.size // n_local, n_local)
    return Mesh(grid, (host_axis, env_axis))


def env_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Splits a leading env axis over every mesh axis (host-local shards
    never cross DCN; within a host, envs spread over local devices)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_global_env_batch(mesh: Mesh, local_tree):
    """Assembles a globally-sharded env batch from this host's local
    shard (each process passes only its own envs).  With one process this
    is equivalent to device_put with the env-batch sharding."""
    sharding = env_batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_tree)


def assert_partitioned(tree, mesh: Mesh) -> None:
    """Raises if any leading-axis leaf of ``tree`` is fully replicated —
    the scaling-evidence check that the env state is actually sharded."""
    n = mesh.devices.size
    if n == 1:
        return  # trivially replicated == partitioned on one device
    bad = []

    def check(path, x):
        if (hasattr(x, "sharding") and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % n == 0 and x.shape[0] >= n):
            if x.sharding.is_fully_replicated:
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise AssertionError(
            f"env batch leaves unexpectedly replicated: {bad[:5]}")
