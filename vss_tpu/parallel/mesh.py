"""Device mesh helpers for sharded indexes."""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "SHARD_AXIS"]

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first n devices (row-sharding axis).

    The reference's parallelism is threads over shared memory (SURVEY
    §2.3); ours is shard-local graphs over mesh devices with collectives
    for the merge — no shared mutable state anywhere.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))
