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
from vss_tpu.index.graph import (
    HNSWConfig,
    HNSWGraph,
    check_rowids_int32,
    empty_graph,
    sample_levels,
)
from vss_tpu.index.search import _default_fused, _hnsw_search_impl
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
        # host-side bookkeeping, per shard (mirrors HNSWIndex's)
        S = self.n_shards
        self.next_slot = [0] * S
        self.upper_used = [0] * S
        self.free_slots: list[list[int]] = [[] for _ in range(S)]
        self.shard_deleted = [0] * S
        self.rowid_to_loc: dict[int, tuple[int, int]] = {}  # rowid -> (shard, slot)
        self.deleted_count = 0
        self._insert_seed = 0
        self._insert_counter = 0
        self.dirty = False
        # int8 tapes: global symmetric quantization scale (as HNSWIndex)
        self.vector_scale = 1.0
        # full-precision rescore side tape, stacked [S, cap, d] in SCALED
        # units (round-4: single-shard int8 search gets its last ~2
        # recall points from the exact f32 rerank — the sharded path was
        # silently worse without one, and rebalance() double-quantized)
        self.rerank_tapes: Optional[jax.Array] = None
        # per-instance jit caches. NOT functools.lru_cache on the methods:
        # that would key on `self` and pin every index (and its device
        # arrays) for the process lifetime — a leak in long-lived services.
        self._wave_fns: dict = {}
        self._search_fns: dict = {}
        self._scan_fns: dict = {}
        # stacked per-shard squared-norm tape [S, cap], keyed on the
        # graph pytree identity (DML publishes a fresh pytree)
        self._norms_cache: Optional[tuple] = None

    supports_filter_pushdown = True

    def slot_rowid_array(self) -> np.ndarray:
        """slot -> rowid tape(s), host copy: [n_shards, cap]. The uniform
        surface filtered search masks are built against."""
        return np.asarray(self.graphs.slot_to_rowid)

    # ------------------------------------------------------------ sharding
    def _shard_spec(self):
        return NamedSharding(self.mesh, P(SHARD_AXIS))

    def _put(self, host_array):
        """Shard a host array along its leading axis onto the mesh —
        multi-process safe (each process feeds its local shards)."""
        from vss_tpu.parallel.multihost import place_sharded

        if (
            isinstance(host_array, jax.Array)
            and not host_array.is_fully_addressable
        ):
            # already a global array produced by an SPMD computation
            return host_array
        return place_sharded(self.mesh, host_array)

    def _place(self, stacked: HNSWGraph) -> HNSWGraph:
        return jax.tree.map(self._put, stacked)

    def _init_rerank_tapes(self, vectors, rowids):
        """Populate the stacked side tape from scaled f32 vectors using
        the (shard, slot) map both build paths fill."""
        rr = self.config.rerank_dtype
        if rr is None or self.graphs is None:
            self.rerank_tapes = None
            return
        S = self.n_shards
        cap = int(self.graphs.vectors.shape[1])
        d = self.config.dims
        rt = np.zeros((S, cap, d), np.float32)
        if len(rowids):
            locs = np.asarray(
                [self.rowid_to_loc[int(r)] for r in rowids], np.int64
            )
            rt[locs[:, 0], locs[:, 1]] = np.asarray(vectors, np.float32)
        self.rerank_tapes = self._put(rt.astype(rr))

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
        method: str = "auto",
        progress=None,
    ) -> "ShardedHNSWIndex":
        """Distributed build: round-robin row partition, then per-shard
        construction under shard_map.

        method: 'exact' — the SPMD port of the MXU bulk builder (each
        pass one program over all shards, `parallel/sharded_build.py`;
        multi-process meshes repair per process over their addressable
        shards); 'wave' — lock-step wave insertion (the round-2 path,
        still used by insert()); 'auto' — exact whenever shards have
        enough rows."""
        self = cls(config, mesh)
        S = self.n_shards
        vectors = np.asarray(vectors, np.float32)
        if config.storage_dtype == "int8":
            self.vector_scale = float(np.abs(vectors).max()) / 127.0 or 1.0
            vectors = vectors / self.vector_scale
        n, d = vectors.shape
        if rowids is None:
            rowids = np.arange(n, dtype=np.int64)
        check_rowids_int32(rowids)
        efc = efc or config.ef_construction
        if method == "auto":
            method = "exact" if n >= 4 * S else "wave"
        if method == "exact":
            from vss_tpu.parallel.sharded_build import build_exact_sharded

            rowids = np.asarray(rowids)
            build_exact_sharded(
                self, vectors, rowids, seed=seed, progress=progress
            )
            self._init_rerank_tapes(vectors, rowids)
            return self

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
            args = [self._put(a) for a in (wv, sl, lv, ur, rid, va)]
            stacked = wave_fn(stacked, *args)
            if progress is not None:
                progress(min((w + 1) * W * S, n), n)
        self.graphs = stacked
        self.count = n
        self.dirty = True
        self.next_slot = [len(p) for p in parts]
        self.upper_used = list(next_rows)
        for s, part in enumerate(parts):
            for slot, row in enumerate(part):
                self.rowid_to_loc[int(rowids[row])] = (s, slot)
        self._insert_seed = n
        self._insert_counter = n
        self._init_rerank_tapes(vectors, rowids)
        return self

    def _make_wave_fn(self, W: int, efc: int, expand: int, intra_k: int):
        key = (W, efc, expand, intra_k)
        if key in self._wave_fns:
            return self._wave_fns[key]
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
        self._wave_fns[key] = jax.jit(fn)
        return self._wave_fns[key]

    # ------------------------------------------------------------ search
    def _search_fn(self, k: int, ef: int, expand: int, all_valid: bool,
                   with_mask: bool = False, with_rerank: bool = False):
        key = (k, ef, expand, all_valid, with_mask, with_rerank)
        if key in self._search_fns:
            return self._search_fns[key]
        config = self.config

        def per_shard(graph_blk, q, *rest):
            g = jax.tree.map(lambda x: x[0], graph_blk)
            rest = list(rest)
            mask = rest.pop(0)[0] if with_mask else None
            rt = rest.pop(0)[0] if with_rerank else None
            allow = g.valid if mask is None else (g.valid & mask)
            fused = _default_fused(g)
            if fused and g.vectors.dtype != jnp.float32:
                fused = False  # sub-word tapes need a packed view cache
            # impl directly (not hnsw_search): the eval counters must
            # stay TRACED so each shard's count rides the shard_map out
            d, slots, _iters, evals = _hnsw_search_impl(
                g, config, q.astype(jnp.float32), allow, k,
                max(ef, k), expand, 0,
                not (all_valid and mask is None), True, fused,
                None, None, 0, None, None, 1, rt,
            )
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
            # per-shard distance-eval counter (the 1/S scaling witness
            # the virtual CPU mesh CAN measure) stays sharded: [1]/shard
            ev = jnp.reshape(evals.astype(jnp.int32), (1,))
            return md, mr, ev

        in_specs = (
            (P(SHARD_AXIS), P())
            + ((P(SHARD_AXIS),) if with_mask else ())
            + ((P(SHARD_AXIS),) if with_rerank else ())
        )
        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(), P(), P(SHARD_AXIS)),
            check_vma=False,
        )
        self._search_fns[key] = jax.jit(fn)
        return self._search_fns[key]

    def shard_ef(self, ef: int, k: int, margin: Optional[int] = None) -> int:
        """Per-shard beam width for a round-robin row partition.

        Each shard holds a uniform 1/S sample of the corpus, so a global
        ef-wide beam's work splits across shards: a shard only has to
        surface ITS members of the global top-k (~k/S of them, and those
        are its locally nearest rows — the ones beam search finds most
        reliably), not a full-quality local top-k. ef/S plus a fixed
        margin holds global recall within ~1pt of the 1-shard number
        (validated on the bench_scaling ladder) while per-shard distance
        evals drop with shard size — the round-4 design ran the FULL ef
        on every shard and did S times the work of one big graph
        (SCALING_r04 qps_efficiency 0.30/0.14/0.04 at S=2/4/8)."""
        S = self.n_shards
        if S <= 1:
            return max(ef, k)
        if margin is None:
            # floor of 8 measured on the 8-shard CPU-mesh ladder: margin 4
            # (ef_shard=12 at S=8, ef=64) lost 3 pts of recall; margin 8
            # (ef_shard=16) holds within 1 pt while still cutting beam
            # iterations ~4x (tests/test_sharded.py scaled-ef test)
            margin = max(8, ef // (4 * S))
        return max(k, cdiv(ef, S) + margin)

    def search(self, queries, k: int, ef: Optional[int] = None,
               expand: int = 1, filter_mask=None, scale_ef: bool = True,
               with_stats: bool = False):
        """Broadcast batched search; returns (dists [B,k], rowids [B,k]).

        `filter_mask`: optional bool [n_shards, cap] per-slot predicate
        (rows allowed into results), sharded along the mesh axis.
        `scale_ef`: shrink the per-shard beam to `shard_ef(ef, k)`
        (`ef` keeps its global meaning; False forces the full beam on
        every shard). `with_stats=True` additionally returns
        {"per_shard_evals": [S], "ef_shard": int} — the per-shard work
        counters (SURVEY §5.1 surface, sharded form)."""
        graphs = self.graphs  # snapshot: lock-free concurrent reads
        if graphs is None:
            raise ValueError("index is empty — call build() first")
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        if self.config.storage_dtype == "int8":
            q = q / self.vector_scale
        ef = max(ef or self.config.ef_search, k)
        ef_shard = self.shard_ef(ef, k) if scale_ef else ef
        rt = self.rerank_tapes
        with_rerank = rt is not None
        extra = (rt,) if with_rerank else ()
        if filter_mask is not None:
            mask = self._put(np.asarray(filter_mask, bool))
            fn = self._search_fn(k, ef_shard, expand, False, True, with_rerank)
            d, rows, ev = fn(graphs, q, mask, *extra)
        else:
            fn = self._search_fn(
                k, ef_shard, expand, self.deleted_count == 0, False,
                with_rerank,
            )
            d, rows, ev = fn(graphs, q, *extra)
        if self.config.storage_dtype == "int8":
            from vss_tpu.index.dense import rescale_distances

            d = rescale_distances(d, self.vector_scale, self.config.metric)
        if with_stats:
            return d, rows, {"per_shard_evals": ev, "ef_shard": ef_shard}
        return d, rows

    # ------------------------------------------------------ exact scan
    def norms(self) -> jax.Array:
        """Stacked per-shard squared-norm tape [S, cap] of the STORED
        values, cached per graph pytree (HNSWIndex.norms analog)."""
        g = self.graphs
        if self._norms_cache is not None and self._norms_cache[0] is g:
            return self._norms_cache[1]
        spec = self._shard_spec()

        @functools.partial(jax.jit, out_shardings=spec)
        def _compute(v):
            vf = v.astype(jnp.float32)
            return jnp.sum(vf * vf, axis=-1)

        n = _compute(g.vectors)
        self._norms_cache = (g, n)
        return n

    def _scan_fn(self, k: int, with_mask: bool, with_rerank: bool):
        """shard_map'd storage-native exact scan: each shard streams its
        OWN tape slice through `scan_topk` (bytes/shard = cap*d*itemsize,
        trivially 1/S of the corpus), then one all_gather + k-way merge.
        The sharded form of the serving operator the flagship bench
        elects (`ops/scan.py`; reference analog `search_exact_`,
        /root/reference/src/include/usearch/index.hpp:4004-4025 —
        single-node there, embarrassingly parallel here)."""
        key = (k, with_mask, with_rerank)
        if key in self._scan_fns:
            return self._scan_fns[key]
        from vss_tpu.ops.scan import scan_topk

        metric = self.config.metric

        def per_shard(graph_blk, q, xn, *rest):
            g = jax.tree.map(lambda x: x[0], graph_blk)
            rest = list(rest)
            allow = g.valid
            if with_mask:
                allow = allow & rest.pop(0)[0]
            rt = rest.pop(0)[0] if with_rerank else None
            d, slots = scan_topk(
                q, g.vectors, k, metric, valid_mask=allow,
                x_norms=xn[0], rerank_tape=rt, keep=2 * k,
            )
            rows = jnp.where(
                slots >= 0,
                jnp.take(g.slot_to_rowid, jnp.maximum(slots, 0)),
                -1,
            )
            all_d = jax.lax.all_gather(d, SHARD_AXIS, axis=1)
            all_r = jax.lax.all_gather(rows, SHARD_AXIS, axis=1)
            B = all_d.shape[0]
            return merge_topk(all_d.reshape(B, -1), all_r.reshape(B, -1), k)

        in_specs = (
            (P(SHARD_AXIS), P(), P(SHARD_AXIS))
            + ((P(SHARD_AXIS),) if with_mask else ())
            + ((P(SHARD_AXIS),) if with_rerank else ())
        )
        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
        self._scan_fns[key] = jax.jit(fn)
        return self._scan_fns[key]

    def scan_search(self, queries, k: int, filter_mask=None,
                    with_stats: bool = False):
        """Sharded exact-scan serving path (EXACT_SCAN_TOPK over shards):
        per-shard `scan_topk` on the local tape slice, all_gather + merge.
        Returns (dists [B, k], rowids [B, k]) like `search()`; distances
        exact w.r.t. the rerank tape when one exists. `with_stats=True`
        adds {"per_shard_bytes": int} — the bytes each shard streams per
        query batch (deterministic: its tape slice)."""
        graphs = self.graphs
        if graphs is None:
            raise ValueError("index is empty — call build() first")
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        if self.config.storage_dtype == "int8":
            q = q / self.vector_scale
        rt = self.rerank_tapes
        with_rerank = rt is not None
        extra = (rt,) if with_rerank else ()
        xn = self.norms()
        if filter_mask is not None:
            mask = self._put(np.asarray(filter_mask, bool))
            fn = self._scan_fn(k, True, with_rerank)
            d, rows = fn(graphs, q, xn, mask, *extra)
        else:
            fn = self._scan_fn(k, False, with_rerank)
            d, rows = fn(graphs, q, xn, *extra)
        if self.config.storage_dtype == "int8":
            from vss_tpu.index.dense import rescale_distances

            d = rescale_distances(d, self.vector_scale, self.config.metric)
        if with_stats:
            cap = int(graphs.vectors.shape[1])
            itemsize = jnp.dtype(graphs.vectors.dtype).itemsize
            return d, rows, {
                "per_shard_bytes": cap * self.config.dims * itemsize
            }
        return d, rows

    # ------------------------------------------------------------ CRUD
    def insert(self, vectors, rowids):
        """Insert rows, balancing across shards; recycles tombstoned slots."""
        if self.graphs is None:
            raise ValueError("index is empty — call build() first")
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None]
        if self.config.storage_dtype == "int8":
            vectors = vectors / self.vector_scale  # out-of-range clips in-wave
        rowids = np.asarray(rowids, np.int64)
        check_rowids_int32(rowids)
        n = vectors.shape[0]
        S = self.n_shards
        d = self.config.dims
        for r in rowids:
            if int(r) in self.rowid_to_loc:
                raise ValueError(f"duplicate rowid {int(r)}")
        levels = sample_levels(n, self.config, seed=self._insert_seed)
        self._insert_seed += n
        # fill tombstoned slots first (whatever shard they are on), then
        # round-robin the rest to keep shards balanced
        assign: list[int] = []
        for s in range(S):
            take = min(len(self.free_slots[s]), n - len(assign))
            assign.extend([s] * take)
            if len(assign) == n:
                break
        while len(assign) < n:
            assign.append(self._insert_counter % S)
            self._insert_counter += 1
        shard_of = np.asarray(assign, np.int64)
        # capacity check / growth
        per_new = [int((shard_of == s).sum()) for s in range(S)]
        need_cap = max(
            self.next_slot[s] - len(self.free_slots[s]) + per_new[s] + 8
            for s in range(S)
        )
        need_upper = max(
            self.upper_used[s] + int(levels[shard_of == s].sum()) + 1
            for s in range(S)
        )
        self._ensure_capacity(need_cap, need_upper)
        cap = int(self.graphs.vectors.shape[1])

        from vss_tpu.utils import next_pow2

        W = next_pow2(max(per_new) if per_new else 1)
        wv = np.zeros((S, W, d), np.float32)
        sl = np.zeros((S, W), np.int32)
        lv = np.zeros((S, W), np.int32)
        ur = np.full((S, W, self.config.max_levels), -1, np.int32)
        rid = np.full((S, W), -1, np.int32)
        va = np.zeros((S, W), bool)
        for s in range(S):
            rows = np.flatnonzero(shard_of == s)
            cnt = len(rows)
            slots = []
            for _ in range(min(cnt, len(self.free_slots[s]))):
                slots.append(self.free_slots[s].pop())
                self.shard_deleted[s] -= 1
                self.deleted_count -= 1
            fresh = cnt - len(slots)
            if fresh > 0:
                slots.extend(
                    range(self.next_slot[s], self.next_slot[s] + fresh)
                )
                self.next_slot[s] += fresh
            if cnt:
                wv[s, :cnt] = vectors[rows]
                sl[s, :cnt] = slots
                lv[s, :cnt] = levels[rows]
                rid[s, :cnt] = rowids[rows].astype(np.int32)
                va[s, :cnt] = True
                for i, row in enumerate(rows):
                    self.rowid_to_loc[int(rowids[row])] = (s, int(slots[i]))
            # padding rows scatter into the reserved tail
            if cnt < W:
                sl[s, cnt:] = cap - 8 + (np.arange(W - cnt) % 7)
            ur[s], self.upper_used[s] = plan_wave_rows(
                lv[s], self.upper_used[s], self.config.max_levels
            )
        wave_fn = self._make_wave_fn(
            W, self.config.ef_construction, 4, min(self.config.m, W)
        )
        args = [self._put(a) for a in (wv, sl, lv, ur, rid, va)]
        self.graphs = wave_fn(self.graphs, *args)
        if self.rerank_tapes is not None:
            # scatter the scaled f32 rows into the side tape at the same
            # (shard, slot) targets the wave wrote
            s_arr = np.repeat(np.arange(S), W)[va.reshape(-1)]
            sl_arr = sl.reshape(-1)[va.reshape(-1)]
            v_arr = wv.reshape(S * W, d)[va.reshape(-1)]
            self.rerank_tapes = self.rerank_tapes.at[
                jnp.asarray(s_arr), jnp.asarray(sl_arr)
            ].set(jnp.asarray(v_arr, self.rerank_tapes.dtype))
        self.count += n
        self.dirty = True

    def delete(self, rowids) -> int:
        """Tombstone rows (graph untouched; results exclude them)."""
        locs = []
        for r in rowids:
            loc = self.rowid_to_loc.pop(int(r), None)
            if loc is not None:
                locs.append(loc)
        if not locs:
            return 0
        sh = jnp.asarray([l[0] for l in locs], jnp.int32)
        sl = jnp.asarray([l[1] for l in locs], jnp.int32)
        per_shard = np.bincount(
            [l[0] for l in locs], minlength=self.n_shards
        ).astype(np.int32)
        self.graphs = dataclasses.replace(
            self.graphs,
            valid=self.graphs.valid.at[sh, sl].set(False),
            count=self.graphs.count - jnp.asarray(per_shard),
        )
        for s, slot in locs:
            self.free_slots[s].append(slot)
            self.shard_deleted[s] += 1
        self.deleted_count += len(locs)
        self.count -= len(locs)
        self.dirty = True
        return len(locs)

    def _ensure_capacity(self, need_cap: int, need_upper: int):
        cap = int(self.graphs.vectors.shape[1])
        ucap = int(self.graphs.upper_adj.shape[1])
        new_cap, new_ucap = cap, ucap
        while new_cap < need_cap:
            new_cap *= 2
        while new_ucap < need_upper:
            new_ucap *= 2
        if (new_cap, new_ucap) == (cap, ucap):
            return

        def pad(x, axis, n, fill):
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, n - x.shape[axis])
            return jnp.pad(x, widths, constant_values=fill)

        g = self.graphs
        self.graphs = self._place(
            HNSWGraph(
                vectors=pad(g.vectors, 1, new_cap, 0.0),
                adj0=pad(g.adj0, 1, new_cap, -1),
                upper_adj=pad(g.upper_adj, 1, new_ucap, -1),
                upper_row=pad(g.upper_row, 1, new_cap, -1),
                levels=pad(g.levels, 1, new_cap, 0),
                valid=pad(g.valid, 1, new_cap, False),
                slot_to_rowid=pad(g.slot_to_rowid, 1, new_cap, -1),
                entry=g.entry,
                max_level=g.max_level,
                count=g.count,
            )
        )
        if self.rerank_tapes is not None:
            self.rerank_tapes = self._put(
                pad(self.rerank_tapes, 1, new_cap, 0.0)
            )

    # ------------------------------------------------ compact / persist
    def _extract_shard(self, s: int):
        """Materialize shard `s` as a standalone HNSWIndex (host copy)."""
        from vss_tpu.index.dense import HNSWIndex

        host = jax.tree.map(lambda x: np.asarray(x[s]), self.graphs)
        idx = HNSWIndex(self.config, capacity=64)
        idx.graph = jax.tree.map(jnp.asarray, host)
        idx.next_slot = self.next_slot[s]
        idx.upper_used = self.upper_used[s]
        idx.free_slots = list(self.free_slots[s])
        idx.deleted_count = self.shard_deleted[s]
        idx.rowid_to_slot = {
            r: slot for r, (sh, slot) in self.rowid_to_loc.items() if sh == s
        }
        idx._insert_seed = self._insert_seed
        idx.vector_scale = self.vector_scale
        if self.rerank_tapes is not None:
            idx.rerank_tape = jnp.asarray(np.asarray(self.rerank_tapes[s]))
        else:
            idx.rerank_tape = None
        return idx

    def _restack(self, locals_) -> None:
        from vss_tpu.index.graph import grow_graph

        cap = max(l.graph.capacity for l in locals_)
        ucap = max(l.graph.upper_capacity for l in locals_)
        grown = [
            grow_graph(l.graph, self.config, cap, ucap) for l in locals_
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *grown)
        self.graphs = self._place(stacked)
        rts = [getattr(l, "rerank_tape", None) for l in locals_]
        if rts and all(rt is not None for rt in rts):
            self.rerank_tapes = self._put(jnp.stack([
                jnp.pad(rt, ((0, cap - rt.shape[0]), (0, 0)))
                if rt.shape[0] < cap else rt[:cap]
                for rt in rts
            ]))
        else:
            self.rerank_tapes = None
        self.next_slot = [l.next_slot for l in locals_]
        self.upper_used = [l.upper_used for l in locals_]
        self.free_slots = [list(l.free_slots) for l in locals_]
        self.shard_deleted = [l.deleted_count for l in locals_]
        self.deleted_count = sum(self.shard_deleted)
        self.rowid_to_loc = {
            int(r): (s, int(slot))
            for s, l in enumerate(locals_)
            for r, slot in l.rowid_to_slot.items()
        }
        self.count = sum(l.count for l in locals_)
        self.vector_scale = max((l.vector_scale for l in locals_), default=1.0)

    def compact(self):
        """Compaction (PRAGMA hnsw_compact_index analog): when tombstones
        have skewed the shards, repartition globally (skew-aware rebuild);
        otherwise compact each shard in place."""
        if self.deleted_count == 0:
            return
        if self.rebalance():
            return
        locals_ = [self._extract_shard(s) for s in range(self.n_shards)]
        for l in locals_:
            l.compact()
        self._restack(locals_)
        self.dirty = True

    def _live_counts(self) -> np.ndarray:
        counts = np.zeros(self.n_shards, np.int64)
        for s, _slot in self.rowid_to_loc.values():
            counts[s] += 1
        return counts

    def rebalance(self, max_imbalance: float = 0.25,
                  wave_size: int = 1024) -> bool:
        """Skew-aware repartitioning (SURVEY §5.8): when live row counts
        diverge across shards beyond `max_imbalance` of the mean (deletes
        land unevenly; NULLs were dropped upstream), pull every live row
        back and rebuild with a balanced round-robin partition. Returns
        True if a rebuild happened.

        The reference has no analog — its graph is one shared-memory
        structure; shard balance is a distributed-only concern."""
        if self.graphs is None:
            return False
        counts = self._live_counts()
        total = int(counts.sum())
        if total == 0:
            return False
        mean = total / self.n_shards
        if counts.max() - counts.min() <= max_imbalance * max(mean, 1.0):
            return False
        vecs, rids = [], []
        host_valid = np.asarray(self.graphs.valid)
        # rebuild from the FULL-PRECISION side tape when one exists:
        # requantizing from the int8 tape double-quantizes on every
        # rebalance (round-3 weak #9); the side tape holds the exact
        # scaled f32 values, so scale-retape round trips losslessly
        host_r = (
            np.asarray(self.rerank_tapes)
            if self.rerank_tapes is not None else None
        )
        host_vecs = np.asarray(self.graphs.vectors)
        host_rows = np.asarray(self.graphs.slot_to_rowid)
        for s in range(self.n_shards):
            live = np.flatnonzero(host_valid[s])
            src = host_r[s] if host_r is not None else host_vecs[s]
            v = src[live].astype(np.float32)
            if self.config.storage_dtype == "int8":
                v = v * self.vector_scale
            vecs.append(v)
            rids.append(host_rows[s][live])
        vectors = np.concatenate(vecs) if vecs else np.zeros((0, self.config.dims))
        rowids = np.concatenate(rids).astype(np.int64)
        fresh = ShardedHNSWIndex.build(
            vectors, self.config, self.mesh, rowids=rowids,
            wave_size=wave_size, seed=self._insert_seed,
        )
        self.__dict__.update(fresh.__dict__)
        self.dirty = True
        return True

    def save(self, path: str):
        """Checkpoint: one stream per shard + catalog json (directory)."""
        import json
        import os

        from vss_tpu.storage.serialize import save_index

        os.makedirs(path, exist_ok=True)
        for s in range(self.n_shards):
            save_index(
                self._extract_shard(s), os.path.join(path, f"shard_{s}.vss")
            )
        with open(os.path.join(path, "sharded.json"), "w") as f:
            json.dump(
                {"n_shards": self.n_shards, "config": dataclasses.asdict(self.config)},
                f,
            )
        self.dirty = False

    def vacuum(self):
        """No-op, like HNSWIndex.vacuum (reference parity)."""

    def merge(self, other):
        raise NotImplementedError("HNSWIndex::MergeIndexes() not implemented")

    # ------------------------------------------------------------ stats
    def stats(self) -> dict:
        """Aggregated per-level stats across shards (pragma info analog)."""
        per_shard = [self._extract_shard(s).stats() for s in range(self.n_shards)]
        agg = {
            "metric": self.config.metric,
            "dimensions": self.config.dims,
            "count": self.count,
            "deleted": self.deleted_count,
            "capacity": sum(p["capacity"] for p in per_shard),
            "connectivity": self.config.m,
            "connectivity_base": self.config.m0,
            "ef_construction": self.config.ef_construction,
            "ef_search": self.config.ef_search,
            "approx_memory_bytes": sum(p["approx_memory_bytes"] for p in per_shard),
            "num_levels": max((p["num_levels"] for p in per_shard), default=0),
            "n_shards": self.n_shards,
            "levels": [],
        }
        for lvl in range(agg["num_levels"]):
            nodes = edges = max_edges = alloc = 0
            for p in per_shard:
                if lvl < len(p["levels"]):
                    nodes += p["levels"][lvl]["nodes"]
                    edges += p["levels"][lvl]["edges"]
                    max_edges += p["levels"][lvl]["max_edges"]
                    alloc += p["levels"][lvl].get("allocated_bytes", 0)
            agg["levels"].append(
                {"level": lvl, "nodes": nodes, "edges": edges,
                 "max_edges": max_edges, "allocated_bytes": alloc}
            )
        return agg

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None) -> "ShardedHNSWIndex":
        import json
        import os

        from vss_tpu.storage.serialize import load_index

        with open(os.path.join(path, "sharded.json")) as f:
            meta = json.load(f)
        config = HNSWConfig(**meta["config"])
        mesh = mesh or make_mesh(meta["n_shards"])
        if mesh.devices.size != meta["n_shards"]:
            raise ValueError(
                f"checkpoint has {meta['n_shards']} shards; mesh has "
                f"{mesh.devices.size} devices"
            )
        self = cls(config, mesh)
        locals_ = [
            load_index(os.path.join(path, f"shard_{s}.vss"))
            for s in range(meta["n_shards"])
        ]
        self._restack(locals_)
        self._insert_seed = max((l._insert_seed for l in locals_), default=0)
        self._insert_counter = self.count
        return self
