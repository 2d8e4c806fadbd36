"""Multi-host (pod-slice) initialization helpers.

The reference has no distributed layer at all (SURVEY §2.3); vss_tpu's
multi-chip design extends to multi-host unchanged — shards are
device-local whether devices sit on one host or across a pod slice, and
the search's `all_gather` rides ICI within a slice / DCN across slices,
chosen by XLA from the mesh's device order.

On a real pod slice, every host runs the same program:

    from vss_tpu.parallel import multihost
    mesh = multihost.initialize()          # jax.distributed + global mesh
    idx = ShardedHNSWIndex.build(vectors, config, mesh)   # same API
    d, rows = idx.search(queries, k=10)    # replicated on every host

This module cannot be exercised in the single-host test environment
(`jax.distributed.initialize` requires the real multi-process runtime);
it is the documented entry point for deployment. Everything below it —
sharded build, broadcast search, collective merge, per-shard CRUD and
checkpointing — is host-count-agnostic and covered by the virtual-mesh
tests.
"""
from __future__ import annotations

from typing import Optional

import jax

from vss_tpu.parallel.mesh import SHARD_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the multi-host runtime and return the global shard mesh.

    With no arguments, jax.distributed auto-detects the TPU pod
    environment (the standard Cloud TPU metadata path). Returns a 1-D
    Mesh over all global devices; build/search on ShardedHNSWIndex then
    run SPMD across hosts, with each host feeding its own process-local
    shards and receiving the replicated merged results.
    """
    import numpy as np
    from jax.sharding import Mesh

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    return Mesh(np.asarray(jax.devices()), (SHARD_AXIS,))
