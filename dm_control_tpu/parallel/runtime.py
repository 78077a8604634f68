"""Multi-host distributed runtime (SURVEY §2.10 TPU-native column).

The reference's only cross-process machinery is multiprocessing pipes
(dm_control/scripts/vec_env.py:433-445).  The TPU-native replacement:

- one JAX process per host, joined with ``jax.distributed.initialize``;
- a ('host', 'env') mesh whose host axis maps to DCN and whose env axis
  maps to the host-local devices over ICI — env batches are sharded over
  BOTH axes (each device owns batch/n_total envs), so stepping never
  crosses DCN and learner gradient psums ride ICI first;
- host-local array construction (each host materializes only its own
  env shard and assembles the global array from per-device shards).

Single-process (incl. the driver's virtual-device CPU mesh) uses the
same code path: process_count == 1 simply makes the host axis length 1.

All helpers are backend-agnostic: process membership is read off the
devices themselves (``device.process_index``), never off the default
backend — in this container a TPU-tunnel plugin owns the default
backend while multi-process validation runs on the CPU backend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None,
               **kwargs) -> None:
    """Joins this process to the distributed runtime.

    On TPU pods all arguments are inferred from the environment; on other
    platforms pass the coordinator's host:port plus this process's rank.
    Extra keyword arguments (e.g. ``shutdown_timeout_seconds`` — raise it
    when process completion times can skew more than the 300 s default,
    such as independently-compiling CPU workers) pass through to
    ``jax.distributed.initialize``.  No-op if already initialized.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
            **kwargs)
    except RuntimeError:
        # single-process usage without a coordinator: nothing to join
        if coordinator_address is not None:
            raise


def _process_rows(devices) -> np.ndarray:
    """Groups ``devices`` into a (n_processes, n_local) grid by owning
    process, rows ordered by process index."""
    devices = np.asarray(devices).reshape(-1)
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(
            f"uneven devices per process: { {k: len(v) for k, v in by_proc.items()} }")
    return np.asarray([by_proc[k] for k in sorted(by_proc)])


def pod_mesh(host_axis: str = "host", env_axis: str = "env",
             devices: Optional[Sequence] = None) -> Mesh:
    """('host', 'env') mesh: rows = processes (DCN), cols = each host's
    local devices (ICI)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(_process_rows(devices), (host_axis, env_axis))


def env_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Splits a leading env axis over every mesh axis (host-local shards
    never cross DCN; within a host, envs spread over local devices)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _mesh_process_count(mesh: Mesh) -> int:
    return len({d.process_index for d in mesh.devices.flat})


def make_global_env_batch(mesh: Mesh, local_tree):
    """Assembles a globally-sharded env batch from this host's local
    shard (each process passes only its own envs).  With one process this
    is equivalent to device_put with the env-batch sharding."""
    sharding = env_batch_sharding(mesh)
    n_procs = _mesh_process_count(mesh)
    if n_procs == 1:
        return jax.device_put(local_tree, sharding)

    def assemble(x):
        x = np.asarray(x)
        gshape = (x.shape[0] * n_procs,) + x.shape[1:]
        idx_map = sharding.addressable_devices_indices_map(gshape)
        starts = {dev: (ix[0].start or 0) for dev, ix in idx_map.items()}
        base = min(starts.values())
        shards = []
        for dev, ix in idx_map.items():
            lo = starts[dev] - base
            hi = lo + ((ix[0].stop or gshape[0]) - (ix[0].start or 0))
            shards.append(jax.device_put(x[lo:hi], dev))
        return jax.make_array_from_single_device_arrays(
            gshape, sharding, shards)

    return jax.tree.map(assemble, local_tree)


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
