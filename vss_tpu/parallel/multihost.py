"""Multi-host (multi-process) runtime: initialization + global placement.

The reference has no distributed layer at all (SURVEY §2.3) — its
"cluster" is one process with threads over shared memory. Here the
multi-chip design extends across hosts: every host runs the same SPMD
program, shards are device-local wherever the device lives, and the
search's `all_gather` merge rides ICI within a slice / DCN across slices,
chosen by XLA from the mesh's device order.

Deployment shape (every host runs the same code):

    from vss_tpu.parallel import multihost
    mesh = multihost.initialize()          # jax.distributed + global mesh
    idx = ShardedHNSWIndex.build(vectors, config, mesh)   # same API
    d, rows = idx.search(queries, k=10)    # replicated on every host

Unlike a single-process mesh, host data destined for non-addressable
devices cannot be `device_put` directly; `place_sharded` assembles global
arrays from each process's local shards
(`jax.make_array_from_process_local_data`). ShardedHNSWIndex routes every
placement through it, so build/search run unchanged multi-process — this
is exercised for real by `tests/test_multihost.py`, which launches
separate coordinator/worker processes on the CPU backend.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vss_tpu.parallel.mesh import SHARD_AXIS

__all__ = [
    "initialize",
    "global_mesh",
    "is_multiprocess",
    "local_shard_indices",
    "place_sharded",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Initialize the multi-host runtime and return the global shard mesh.

    Explicit arguments win; otherwise the VSS_COORDINATOR /
    VSS_NUM_PROCESSES / VSS_PROCESS_ID environment variables; otherwise
    jax.distributed auto-detects the TPU pod environment (the standard
    Cloud TPU metadata path)."""
    coordinator_address = coordinator_address or os.environ.get(
        "VSS_COORDINATOR"
    )
    if num_processes is None and "VSS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VSS_NUM_PROCESSES"])
    if process_id is None and "VSS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VSS_PROCESS_ID"])
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    return global_mesh()


def global_mesh(axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over ALL global devices (every process sees the same)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices this process cannot address."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def local_shard_indices(mesh: Mesh) -> list[int]:
    """Global shard slots owned by this process (mesh device order)."""
    me = jax.process_index()
    return [
        i for i, d in enumerate(mesh.devices.flat) if d.process_index == me
    ]


def place_sharded(mesh: Mesh, host_array, axis: str = SHARD_AXIS):
    """Place a host array shard-wise along its leading axis onto `mesh`.

    Single-process: a plain device_put. Multi-process: each process
    contributes only the leading-axis slices that live on its devices
    (`make_array_from_process_local_data`); `host_array` must hold the
    full global array (every process computes the same partition, so the
    local slice is just an index)."""
    import jax.numpy as jnp

    sharding = NamedSharding(mesh, P(axis))
    if not is_multiprocess(mesh):
        return jax.device_put(jnp.asarray(host_array), sharding)
    local = np.asarray(host_array)[local_shard_indices(mesh)]
    return jax.make_array_from_process_local_data(sharding, local)
