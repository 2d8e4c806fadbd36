"""Sharded HNSW: row-partitioned per-device graphs with collective merge.

The multi-chip layer BASELINE.json's north star prescribes: the base table
and graph are hash/round-robin partitioned into one independent HNSW shard
per device; a search broadcasts the query batch to every shard
(replicated operand under `shard_map`), each shard runs the batched beam
search locally, and the per-shard top-k lists are combined with an
`all_gather` over the mesh axis followed by a k-way merge — the collective
rides ICI, and no shard ever touches another shard's memory (the
reference's shared-memory mutexes have no analog here by design).

Build is embarrassingly parallel: every wave step inserts one wave into
every shard simultaneously inside a single `shard_map`ped program.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vss_tpu.index.build import insert_wave, plan_wave_rows
from vss_tpu.index.graph import HNSWConfig, HNSWGraph, empty_graph, sample_levels
from vss_tpu.index.search import hnsw_search
from vss_tpu.ops.topk import merge_topk
from vss_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from vss_tpu.utils import cdiv, round_up

__all__ = ["ShardedHNSWIndex"]


def _stack_empty(config: HNSWConfig, n_shards: int, cap: int, upper_cap: int):
    g = empty_graph(config, cap, upper_cap)
    return jax.tree.map(lambda x: jnp.stack([x] * n_shards), g)


class ShardedHNSWIndex:
    """Row-partitioned HNSW over a 1-D device mesh."""

    def __init__(self, config: HNSWConfig, mesh: Optional[Mesh] = None):
        self.config = config
        self.mesh = mesh or make_mesh()
        self.n_shards = self.mesh.devices.size
        self.graphs: Optional[HNSWGraph] = None  # stacked: leading axis S
        self.count = 0

    # ------------------------------------------------------------ sharding
    def _shard_spec(self):
        return NamedSharding(self.mesh, P(SHARD_AXIS))

    def _place(self, stacked: HNSWGraph) -> HNSWGraph:
        spec = self._shard_spec()
        return jax.tree.map(lambda x: jax.device_put(x, spec), stacked)

    # ------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        vectors,
        config: HNSWConfig,
        mesh: Optional[Mesh] = None,
        *,
        rowids: Optional[np.ndarray] = None,
        seed: int = 0,
        wave_size: int = 1024,
        efc: Optional[int] = None,
        expand: int = 4,
        progress=None,
    ) -> "ShardedHNSWIndex":
        """Distributed build: round-robin row partition, then lock-step
        wave insertion into all shards at once."""
        self = cls(config, mesh)
        S = self.n_shards
        vectors = np.asarray(vectors, np.float32)
        n, d = vectors.shape
        if rowids is None:
            rowids = np.arange(n, dtype=np.int64)
        efc = efc or config.ef_construction

        # round-robin partition (balanced for any input order; the
        # hash-partition alternative only matters for adversarial rowids)
        parts = [np.arange(s, n, S) for s in range(S)]
        per = max(len(p) for p in parts) if n else 0
        W = max(1, min(wave_size, per))
        cap = round_up(max(per, 1), W) + 8
        levels = sample_levels(n, config, seed)
        upper_cap = max(64, int(levels.sum()) + S * 64 + 1)

        stacked = _stack_empty(config, S, cap, upper_cap)
        stacked = self._place(stacked)

        wave_fn = self._make_wave_fn(W, efc, expand, min(config.m, W))
        next_rows = [0] * S
        n_waves = cdiv(per, W) if per else 0
        for w in range(n_waves):
            wv = np.zeros((S, W, d), np.float32)
            sl = np.zeros((S, W), np.int32)
            lv = np.zeros((S, W), np.int32)
            ur = np.full((S, W, config.max_levels), -1, np.int32)
            rid = np.full((S, W), -1, np.int32)
            va = np.zeros((S, W), bool)
            for s in range(S):
                part = parts[s]
                lo = w * W
                hi = min(lo + W, len(part))
                cnt = max(hi - lo, 0)
                if cnt > 0:
                    rows = part[lo:hi]
                    wv[s, :cnt] = vectors[rows]
                    lv[s, :cnt] = levels[rows]
                    rid[s, :cnt] = rowids[rows].astype(np.int32)
                    va[s, :cnt] = True
                sl[s] = np.arange(lo, lo + W)
                ur[s], next_rows[s] = plan_wave_rows(
                    lv[s], next_rows[s], config.max_levels
                )
            spec = self._shard_spec()
            args = [
                jax.device_put(jnp.asarray(a), spec)
                for a in (wv, sl, lv, ur, rid, va)
            ]
            stacked = wave_fn(stacked, *args)
            if progress is not None:
                progress(min((w + 1) * W * S, n), n)
        self.graphs = stacked
        self.count = n
        return self

    def _make_wave_fn(self, W: int, efc: int, expand: int, intra_k: int):
        config = self.config

        def per_shard(graph_blk, wv, sl, lv, ur, rid, va):
            g = jax.tree.map(lambda x: x[0], graph_blk)
            g2 = insert_wave(
                g, config, wv[0], sl[0], lv[0], ur[0], rid[0], va[0],
                efc, expand, intra_k,
            )
            return jax.tree.map(lambda x: x[None], g2)

        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS),) * 7,
            out_specs=P(SHARD_AXIS),
            check_vma=False,
        )
        return jax.jit(fn)

    # ------------------------------------------------------------ search
    @functools.lru_cache(maxsize=None)
    def _search_fn(self, k: int, ef: int, expand: int):
        config = self.config

        def per_shard(graph_blk, q):
            g = jax.tree.map(lambda x: x[0], graph_blk)
            d, slots = hnsw_search(g, config, q, k, ef=ef, expand=expand)
            rows = jnp.where(
                slots >= 0,
                jnp.take(g.slot_to_rowid, jnp.maximum(slots, 0)),
                -1,
            )
            # per-shard top-k -> all_gather over ICI -> k-way merge,
            # replicated result on every shard
            all_d = jax.lax.all_gather(d, SHARD_AXIS, axis=1)  # [B, S, k]
            all_r = jax.lax.all_gather(rows, SHARD_AXIS, axis=1)
            B = all_d.shape[0]
            md, mr = merge_topk(
                all_d.reshape(B, -1), all_r.reshape(B, -1), k
            )
            return md, mr

        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, queries, k: int, ef: Optional[int] = None, expand: int = 1):
        """Broadcast batched search; returns (dists [B,k], rowids [B,k])."""
        if self.graphs is None:
            raise ValueError("index is empty — call build() first")
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        ef = max(ef or self.config.ef_search, k)
        return self._search_fn(k, ef, expand)(self.graphs, q)
