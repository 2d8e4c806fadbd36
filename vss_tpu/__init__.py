"""vss_tpu — a TPU-native vector similarity search engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
`duckdb-vss` DuckDB extension (HNSW vector index + query rewrites), designed
TPU-first: batched MXU distance tiles, batched beam search, wave-based
parallel graph construction, tombstone CRUD + compaction, checkpointing, a
small relational query layer with index-rewrite optimizers, and multi-chip
sharding over a jax.sharding.Mesh.

Quick start:

    import numpy as np
    from vss_tpu import Database, col, const, fn

    db = Database()
    db.create_table("items", {"id": np.arange(n), "vec": vectors})
    db.create_hnsw_index("idx", "items", "vec", metric="l2sq")
    res = (db.query("items")
             .order_by(fn("array_distance", col("vec"), const(q)))
             .limit(3)
             .select("id")
             .execute())
"""

from vss_tpu.index.dense import HNSWIndex
from vss_tpu.index.graph import HNSWConfig
from vss_tpu.ops.distance import Metric
from vss_tpu.query import (
    BinderError,
    Database,
    Query,
    Table,
    col,
    const,
    fn,
    vss_join,
    vss_match,
)

__version__ = "0.1.0"

__all__ = [
    "Database",
    "Table",
    "Query",
    "HNSWIndex",
    "HNSWConfig",
    "Metric",
    "BinderError",
    "col",
    "const",
    "fn",
    "vss_join",
    "vss_match",
]
