"""HNSW index core: graph arrays, batched search, construction, CRUD."""
from vss_tpu.index.graph import (
    HNSWConfig,
    HNSWGraph,
    empty_graph,
    grow_graph,
    sample_levels,
)
from vss_tpu.index.search import greedy_descent, hnsw_search

__all__ = [
    "HNSWConfig",
    "HNSWGraph",
    "empty_graph",
    "grow_graph",
    "sample_levels",
    "greedy_descent",
    "hnsw_search",
]
