"""HNSW graph representation: flat structure-of-arrays in device memory.

TPU-native replacement for the reference's node-tape layout
(`/root/reference/src/include/usearch/index.hpp:2121-2160`, where each node
is a heap blob `[key][level][neighbor lists]` behind per-node bit-locks).
Here the graph is a handful of dense, fixed-shape `jax.Array`s:

  vectors   [cap, d]        vector tape, slot-indexed
  adj0      [cap, M0]       base-layer adjacency, -1 padded
  upper_adj [upper_cap, M]  levels >= 1, compact rows, -1 padded
  upper_row [cap, Lmax]     (slot, level-1) -> row in upper_adj, -1 if none
  levels    [cap]           node's max level (0 = base only)
  valid     [cap]           slot occupied AND not tombstoned
  slot_to_rowid [cap]       slot -> user row id (-1 = unoccupied)

No locks anywhere: search is functional, and construction is batched
(whole waves inserted by pure array updates) instead of the reference's
per-node spinlocks + atomic slot counters (`index.hpp:2727-2735`).

Static hyperparameters live in `HNSWConfig` (hashable, passed as a static
arg to jitted functions); the mutable arrays live in `HNSWGraph`, a pytree.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HNSWConfig", "HNSWGraph", "cast_to_tape", "empty_graph", "grow_graph", "sample_levels"]

# Defaults mirror the reference's (usearch index.hpp:1282-1298): M=16,
# M0=2M, ef_construction=128, ef_search=64.
DEFAULT_M = 16
DEFAULT_EF_CONSTRUCTION = 128
DEFAULT_EF_SEARCH = 64
# Levels are ~geometric(1/M); 6 levels covers 16^6 = 16M nodes. The level
# loop in the wave builder unrolls statically over this, so keep it tight.
DEFAULT_MAX_LEVELS = 6


@dataclasses.dataclass(frozen=True)
class HNSWConfig:
    """Static HNSW hyperparameters (hashable; jit-static)."""

    dims: int
    metric: str = "l2sq"
    m: int = DEFAULT_M
    m0: int = 0  # 0 -> defaults to 2*m (reference: hnsw_index.cpp:208-217)
    ef_construction: int = DEFAULT_EF_CONSTRUCTION
    ef_search: int = DEFAULT_EF_SEARCH
    max_levels: int = DEFAULT_MAX_LEVELS
    # vector tape precision: 'f32', 'bf16', or 'int8'. Lower precision
    # cuts HBM traffic in the gather-bound beam search (2x / 4x);
    # distances still accumulate in f32. int8 uses a global symmetric
    # scale (ordering is scale-invariant per metric; absolute distances
    # are rescaled on output). The reference only enables FLOAT storage
    # (hnsw_index.cpp:277-290); bf16/int8 are the TPU-native analogs of
    # its commented-out f16/i8 support.
    storage_dtype: str = "f32"
    # rerank: final-stage exact rescoring of the beam's ef-wide result
    # pool against a full-precision side tape. 'auto' = 'f32' for int8
    # tapes (recovers the quantization recall loss for ~ef/evals extra
    # gather traffic, a few percent), 'none' otherwise; explicit
    # 'f32'/'bf16'/'none' override. The reference has no analog — its
    # tape is always FLOAT.
    rerank: str = "auto"

    def __post_init__(self):
        if self.m0 == 0:
            object.__setattr__(self, "m0", 2 * self.m)
        if self.storage_dtype not in ("f32", "bf16", "int8"):
            raise ValueError(
                "storage_dtype must be 'f32', 'bf16' or 'int8', "
                f"got {self.storage_dtype!r}"
            )
        if self.rerank not in ("auto", "none", "f32", "bf16"):
            raise ValueError(
                "rerank must be 'auto', 'none', 'f32' or 'bf16', "
                f"got {self.rerank!r}"
            )

    @property
    def rerank_dtype(self):
        """Resolved rerank tape dtype (jnp dtype) or None when disabled."""
        import jax.numpy as jnp

        r = self.rerank
        if r == "auto":
            r = "f32" if self.storage_dtype == "int8" else "none"
        return {"none": None, "f32": jnp.float32, "bf16": jnp.bfloat16}[r]

    @property
    def inv_log_m(self) -> float:
        return 1.0 / math.log(self.m)

    @property
    def vector_dtype(self):
        import jax.numpy as jnp

        return {
            "f32": jnp.float32,
            "bf16": jnp.bfloat16,
            "int8": jnp.int8,
        }[self.storage_dtype]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HNSWGraph:
    """Mutable graph state. A pytree of device arrays; shapes are static per
    capacity bucket (growth reallocates and triggers recompilation, like any
    capacity change would)."""

    vectors: jax.Array  # f32 [cap, d]
    adj0: jax.Array  # i32 [cap, M0]
    upper_adj: jax.Array  # i32 [upper_cap, M]
    upper_row: jax.Array  # i32 [cap, Lmax]
    levels: jax.Array  # i32 [cap]
    valid: jax.Array  # bool [cap]
    slot_to_rowid: jax.Array  # i32 [cap]
    entry: jax.Array  # i32 scalar: entry slot (-1 if empty)
    max_level: jax.Array  # i32 scalar
    count: jax.Array  # i32 scalar: live (valid) nodes

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def upper_capacity(self) -> int:
        return self.upper_adj.shape[0]


def empty_graph(config: HNSWConfig, capacity: int, upper_capacity: Optional[int] = None) -> HNSWGraph:
    """Allocate an empty graph with the given slot capacity."""
    if upper_capacity is None:
        # ~1/(m-1) of nodes have some upper level; 4x headroom, min 64.
        upper_capacity = max(64, 4 * capacity // max(config.m - 1, 1))
    d = config.dims
    return HNSWGraph(
        vectors=jnp.zeros((capacity, d), config.vector_dtype),
        adj0=jnp.full((capacity, config.m0), -1, jnp.int32),
        upper_adj=jnp.full((upper_capacity, config.m), -1, jnp.int32),
        upper_row=jnp.full((capacity, config.max_levels), -1, jnp.int32),
        levels=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), jnp.bool_),
        slot_to_rowid=jnp.full((capacity,), -1, jnp.int32),
        entry=jnp.int32(-1),
        max_level=jnp.int32(-1),
        count=jnp.int32(0),
    )


def grow_graph(graph: HNSWGraph, config: HNSWConfig, new_capacity: int, new_upper_capacity: Optional[int] = None) -> HNSWGraph:
    """Return a graph with larger capacity, contents preserved."""
    cap = graph.capacity
    if new_upper_capacity is None:
        new_upper_capacity = max(
            graph.upper_capacity, 4 * new_capacity // max(config.m - 1, 1)
        )
    if new_capacity < cap or new_upper_capacity < graph.upper_capacity:
        raise ValueError("grow_graph cannot shrink")

    def pad(x, n, fill):
        widths = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    return HNSWGraph(
        vectors=pad(graph.vectors, new_capacity, 0.0),
        adj0=pad(graph.adj0, new_capacity, -1),
        upper_adj=pad(graph.upper_adj, new_upper_capacity, -1),
        upper_row=pad(graph.upper_row, new_capacity, -1),
        levels=pad(graph.levels, new_capacity, 0),
        valid=pad(graph.valid, new_capacity, False),
        slot_to_rowid=pad(graph.slot_to_rowid, new_capacity, -1),
        entry=graph.entry,
        max_level=graph.max_level,
        count=graph.count,
    )


def sample_levels(n: int, config: HNSWConfig, seed: int = 0) -> np.ndarray:
    """Sample node levels ~ floor(-ln(U) / ln(M)), the reference's
    `choose_random_level_` distribution (`index.hpp:3723-3727`). Host-side:
    levels drive (static) row allocation, so they are drawn with NumPy."""
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    lv = np.floor(-np.log(u) * config.inv_log_m).astype(np.int32)
    return np.minimum(lv, config.max_levels)


def check_rowids_int32(rowids) -> None:
    """The index key tape (`slot_to_rowid`) is int32 — the TPU-friendly
    width for the per-result gather. User rowids are int64; anything past
    2^31-1 would silently wrap, so reject it loudly here (the reference's
    `row_t` is a template parameter instantiated at 64-bit,
    `hnsw_index.hpp:34`; widening our tape is the upgrade path if a table
    ever legitimately exceeds 2^31 rowids)."""
    rowids = np.asarray(rowids)
    if rowids.size and (
        int(rowids.max()) > 2**31 - 1 or int(rowids.min()) < 0
    ):
        raise ValueError(
            "rowid out of the int32 range supported by the HNSW index "
            f"(got {int(rowids.min())}..{int(rowids.max())})"
        )


def cast_to_tape(x, config: HNSWConfig):
    """Cast (scaled-unit) f32 vectors to the tape dtype. int8 tapes round
    and clip; float tapes cast directly."""
    if config.storage_dtype == "int8":
        return jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    return x.astype(config.vector_dtype)
