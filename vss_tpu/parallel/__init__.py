"""Multi-chip layer: device meshes and sharded indexes."""
from vss_tpu.parallel import multihost
from vss_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from vss_tpu.parallel.sharded import ShardedHNSWIndex

__all__ = ["make_mesh", "SHARD_AXIS", "ShardedHNSWIndex", "multihost"]
