"""vss_tpu — a TPU-native vector similarity search engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
`duckdb-vss` DuckDB extension (HNSW vector index + query rewrites), designed
TPU-first: batched MXU distance tiles, batched beam search, wave-based
parallel graph construction, tombstone CRUD + compaction, checkpointing, a
small relational query layer with index-rewrite optimizers, and multi-chip
sharding over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
