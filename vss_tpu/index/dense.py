"""HNSWIndex: the user-facing index object (CRUD + search + stats).

Plays the combined role of the reference's `HNSWIndex : BoundIndex`
adapter (`/root/reference/src/hnsw/hnsw_index.cpp:151-530`) and the
`index_dense_gt` wrapper (`src/include/usearch/index_dense.hpp`): owns the
graph arrays plus the host-side bookkeeping — rowid↔slot maps, the free
slot ring recycled by inserts (the analog of `free_keys_`,
`index_dense.hpp:426-433`), upper-row allocation, and the dirty flag that
gates checkpointing (`hnsw_index.cpp:536-539`).

Deletion is a tombstone: the slot's `valid` bit clears, results exclude
it, the graph keeps routing through it, and the slot is recycled by the
next insert — mirroring `index_dense::remove`
(`index_dense.hpp:1228-1300`). `compact()` rewrites the arrays without
tombstones (the `PRAGMA hnsw_compact_index` path).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vss_tpu.index.build import build_graph_batched, insert_wave, plan_wave_rows
from vss_tpu.index.graph import (
    HNSWConfig,
    HNSWGraph,
    check_rowids_int32,
    empty_graph,
    grow_graph,
    sample_levels,
)
from vss_tpu.index.search import hnsw_search
from vss_tpu.utils import next_pow2
from vss_tpu.ops.distance import Metric

__all__ = ["HNSWIndex", "rescale_distances"]

_RESERVE = 8  # tail slots reserved (scatter sink + padding headroom)


def rescale_distances(d, scale: float, metric) -> jax.Array:
    """Map scaled-unit index distances back to real units (int8 tape).
    l2sq scales by s^2; cosine is scale-invariant; the internal ip
    form 1 - dot maps via dot_real = (1 - d) * s^2."""
    m = Metric.parse(metric)
    s = scale
    if m == Metric.L2SQ:
        return d * (s * s)
    if m == Metric.IP:
        return 1.0 - (1.0 - d) * (s * s)
    return d





@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "keep", "storage_dtype"),
)
def _scan_serve(q, tape, allow, x_norms, rerank_tape, slot_to_rowid,
                scale, k, metric, keep, storage_dtype):
    """The whole exact-scan serving pipeline as ONE device program:
    query scaling -> winnow -> rescore -> rerank -> rowid map ->
    distance rescale. Eagerly composed, each step was a separate relay
    dispatch of multi-ms latency — ~47 ms wall against a ~2 ms kernel
    (round-5 profile), the whole of the r4 sql_serve 10x gap."""
    from vss_tpu.ops.scan import scan_topk

    q = q.astype(jnp.float32)
    if storage_dtype == "int8":
        q = q / scale
    d, slots = scan_topk(
        q, tape, k, metric, valid_mask=allow, x_norms=x_norms,
        rerank_tape=rerank_tape, keep=keep,
    )
    if storage_dtype == "int8":
        d = rescale_distances(d, scale, metric)
    rows = jnp.where(
        slots >= 0, jnp.take(slot_to_rowid, jnp.maximum(slots, 0)), -1
    )
    return d, rows


class HNSWIndex:
    """A single-shard HNSW index over fixed-dimension float vectors."""

    supports_filter_pushdown = True

    def __init__(self, config: HNSWConfig, capacity: int = 1024):
        self.config = config
        capacity = max(capacity, 64)
        self.graph: HNSWGraph = empty_graph(config, capacity)
        self.upper_used = 0
        self.next_slot = 0  # high-water mark of ever-assigned slots
        self.free_slots: list[int] = []
        self.rowid_to_slot: dict[int, int] = {}
        self.deleted_count = 0
        self.dirty = False
        self._insert_seed = 0
        # int8 tape: global symmetric quantization scale (tape holds x/scale)
        self.vector_scale = 1.0
        # scale-drift guard: the scale is frozen at build time, so inserts
        # from a shifted distribution would silently saturate at +-127.
        # Track the max |value| ever seen (real units) and count
        # out-of-range insert rows; compact() requantizes from the f32
        # rerank side tape when drift was flagged (see stats()["quantization"])
        self.scale_max_abs = 0.0
        self.scale_overflow = 0
        # optional full-precision side tape [cap, d] (scaled units) for
        # final-stage exact rescoring of quantized-tape searches
        # (config.rerank; shape[0] always tracks graph.capacity)
        rr = config.rerank_dtype
        self.rerank_tape: Optional[jax.Array] = (
            None if rr is None else jnp.zeros((capacity, config.dims), rr)
        )
        # per-graph-version caches (pivot seeding + norm tape); the first
        # element anchors the graph pytree they were computed from
        self._pivot_cache: Optional[tuple] = None
        self._norms_cache: Optional[tuple] = None
        self._packed_cache: Optional[tuple] = None

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        vectors,
        config: HNSWConfig,
        rowids: Optional[np.ndarray] = None,
        *,
        seed: int = 0,
        wave_size: int = 1024,
        efc: Optional[int] = None,
        expand: int = 4,
        method: str = "auto",
        progress=None,
    ) -> "HNSWIndex":
        """Bulk-build over a full vector set (the CREATE INDEX path).

        method: 'exact' (MXU bulk construction from exact-kNN candidate
        lists — the fastest path for a device-resident corpus, see
        `index/exact_build.py`), 'wave' (batched incremental TPU
        construction), 'native' (multithreaded C++ host builder), or
        'auto' — native for small tables where device dispatch overhead
        dominates, exact otherwise. Auto uses a single builder thread so
        results are deterministic; explicit 'native' uses all cores
        (nondeterministic interleaving, like the reference's parallel
        build).
        """
        # device arrays pass through UNTOUCHED to the exact builder: a
        # multi-GB host round-trip through the relay is not just slow —
        # single transfers past ~1 GB wedge it outright (round-5 GIST-1M
        # GT hung >7 min in jnp.asarray of the 3.84 GB corpus). Callers
        # with device-generated corpora (the bench's 960-d arm) never
        # touch the host.
        on_device = isinstance(vectors, jax.Array)
        if not on_device:
            vectors = np.asarray(vectors, np.float32)
        elif vectors.dtype != jnp.float32:
            vectors = vectors.astype(jnp.float32)
        n = vectors.shape[0]
        idx = cls(config, capacity=64)
        if n == 0:
            return idx
        if rowids is None:
            rowids = np.arange(n, dtype=np.int64)
        rowids = np.asarray(rowids)
        check_rowids_int32(rowids)
        scale = 1.0
        if config.storage_dtype == "int8":
            # graph-internal values live in scaled units; the scale maps
            # them back for user-visible distances
            idx.scale_max_abs = float(
                jnp.max(jnp.abs(vectors)) if on_device
                else np.abs(vectors).max()
            )
            idx.vector_scale = idx.scale_max_abs / 127.0 or 1.0
            scale = idx.vector_scale
        native_threads = 0
        if method == "auto":
            from vss_tpu.index.native import native_available

            if n <= 8192 and native_available():
                method, native_threads = "native", 1  # deterministic
            else:
                method = "exact"
        if method != "exact":
            # wave/native builders index host arrays per wave and take
            # pre-scaled values
            vectors = np.asarray(vectors, np.float32)
            if scale != 1.0:
                vectors = vectors / scale
        if method == "native":
            from vss_tpu.index.native import build_graph_native

            graph, upper_used = build_graph_native(
                vectors, config, seed=seed, rowids=rowids,
                n_threads=native_threads,
            )
        elif method == "exact":
            from vss_tpu.index.exact_build import build_graph_exact

            # want_rerank: the side tape comes back built from the f32
            # device copy the builder already uploaded — a second ~0.5 GB
            # host->device transfer through the relay cost ~38 s of the
            # 1M warm build (the round-3 "post-build tail" regression)
            # vectors go UNSCALED with prescale: the divide fuses into
            # the tape cast on device (no scaled f32 copy — HBM headroom
            # for corpus-scale builds, see build_graph_exact)
            graph, upper_used, rtape = build_graph_exact(
                vectors, config, seed=seed,
                rowids=rowids.astype(np.int32), progress=progress,
                want_rerank=True, prescale=scale,
            )
            idx.graph = graph
            idx.upper_used = upper_used
            idx.next_slot = n
            idx.rowid_to_slot = {int(r): i for i, r in enumerate(rowids)}
            idx._insert_seed = n
            idx.rerank_tape = rtape
            idx.dirty = True
            return idx
        elif method == "wave":
            graph, upper_used = build_graph_batched(
                vectors,
                config,
                seed=seed,
                wave_size=wave_size,
                rowids=rowids.astype(np.int32),
                efc=efc,
                expand=expand,
                progress=progress,
            )
        else:
            raise ValueError(f"unknown build method '{method}'")
        idx.graph = graph
        idx.upper_used = upper_used
        idx.next_slot = n
        idx.rowid_to_slot = {int(r): i for i, r in enumerate(rowids)}
        idx._insert_seed = n
        rr = config.rerank_dtype
        if rr is not None:
            tape = jnp.zeros((graph.capacity, config.dims), rr)
            idx.rerank_tape = tape.at[:n].set(jnp.asarray(vectors, rr))
        idx.dirty = True
        return idx

    # ------------------------------------------------------------- props
    @property
    def count(self) -> int:
        return len(self.rowid_to_slot)

    @property
    def capacity(self) -> int:
        return self.graph.capacity

    @property
    def usable_capacity(self) -> int:
        return self.graph.capacity - _RESERVE

    @property
    def dims(self) -> int:
        return self.config.dims

    @property
    def metric(self) -> Metric:
        return Metric.parse(self.config.metric)

    # ------------------------------------------------------------- search
    def search(
        self,
        queries,
        k: int,
        ef: Optional[int] = None,
        filter_mask: Optional[jax.Array] = None,
        expand: int = 1,
    ):
        """k-NN search. Returns (dists [B, k] f32 ascending, rowids [B, k]
        int64, -1 past the end)."""
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None, :]
        if self.config.storage_dtype == "int8":
            q = q / self.vector_scale
        # snapshot the graph reference ONCE: device arrays are immutable
        # and DML publishes a fresh pytree, so concurrent searches need no
        # lock at all (vs. the reference's shared StorageLock,
        # hnsw_index.cpp:331-333)
        g = self.graph
        pivot_slots, pivot_vecs = self.pivots()
        packed, packing = self.packed_tape()
        d, slots = hnsw_search(
            g, self.config, q, k, ef=ef, filter_mask=filter_mask,
            expand=expand, assume_all_valid=self.deleted_count == 0,
            pivot_slots=pivot_slots, pivot_vecs=pivot_vecs,
            x_norms=self.norms(), packed_tape=packed, packing=packing,
            rerank_tape=self.rerank_tape,
        )
        if self.config.storage_dtype == "int8":
            d = self._rescale_distances(d)
        rows = jnp.where(
            slots >= 0,
            jnp.take(g.slot_to_rowid, jnp.maximum(slots, 0)),
            -1,
        )
        return d, rows

    def _rescale_distances(self, d):
        return rescale_distances(d, self.vector_scale, self.config.metric)

    def pivots(self, min_pivots: int = 8):
        """(pivot_slots [P] i32, pivot_vecs [P, d]) for pivot seeding —
        the level>=1 nodes, a geometric ~count/M sample of the corpus
        (see `search.pivot_seeds`). Cached per graph version (DML
        publishes a fresh pytree, so identity comparison is exact);
        returns (None, None) for graphs too small to sample."""
        g = self.graph
        if self._pivot_cache is not None and self._pivot_cache[0] is g:
            return self._pivot_cache[1], self._pivot_cache[2]
        mask = np.asarray((g.levels >= 1) & (g.slot_to_rowid >= 0))
        idx = np.nonzero(mask)[0]
        if idx.size < min_pivots:
            self._pivot_cache = (g, None, None)
            return None, None
        P = next_pow2(idx.size)
        slots = np.full(P, -1, np.int32)
        slots[: idx.size] = idx
        slots_j = jnp.asarray(slots)
        vecs_j = jnp.take(g.vectors, jnp.maximum(slots_j, 0), axis=0)
        self._pivot_cache = (g, slots_j, vecs_j)
        return slots_j, vecs_j

    def norms(self):
        """Squared-norm tape [cap] f32, cached per graph version (saves a
        full-tape reduction on every search call)."""
        g = self.graph
        if self._norms_cache is not None and self._norms_cache[0] is g:
            return self._norms_cache[1]
        if self.metric == Metric.IP:
            self._norms_cache = (g, None)
            return None
        xv = g.vectors.astype(jnp.float32)
        n = jnp.sum(xv * xv, axis=-1)
        self._norms_cache = (g, n)
        return n

    def packed_tape(self):
        """(packed_view, packing) for the fused gather kernel on
        bf16/int8 tapes (`ops/gather.pack_table`); (None, 1) for f32
        (the raw tape DMAs directly). Cached per graph version."""
        g = self.graph
        if self._packed_cache is not None and self._packed_cache[0] is g:
            return self._packed_cache[1], self._packed_cache[2]
        if g.vectors.dtype == jnp.float32:
            self._packed_cache = (g, None, 1)
            return None, 1
        from vss_tpu.ops.gather import pack_table

        try:
            words, packing = pack_table(g.vectors)
        except (ValueError, AssertionError):
            words, packing = None, 1
        self._packed_cache = (g, words, packing)
        return words, packing

    def scan_search(
        self,
        queries,
        k: int,
        filter_mask: Optional[jax.Array] = None,
    ):
        """Exact-scan serving path (`ops/scan.scan_topk`): one storage-
        native pass over the tape + exact f32 rerank — the fastest
        operator at flagship scale on TPU (the MXU-brute-force insight;
        distances exact w.r.t. the rerank tape when one exists). Returns
        (dists [B, k] f32, rowids [B, k], -1 pad) like search().

        The whole pipeline (query scaling, winnow, rescore, rerank,
        rowid map, distance rescale) runs as ONE jitted dispatch:
        the eager form cost ~10 relay round-trips of multi-ms dispatch
        latency each — ~47 ms wall per call against a ~2 ms kernel
        (round-5 profile; the r4 artifact's sql_serve/scan_serve = 0.099
        gap was exactly this)."""
        q = (
            queries if isinstance(queries, jax.Array)
            else jnp.asarray(np.asarray(queries, np.float32))
        )
        if q.ndim == 1:
            q = q[None, :]
        g = self.graph
        allow = g.valid
        if filter_mask is not None:
            allow = allow & filter_mask
        # keep = 2k: this is the SQL layer's EXACT_SCAN_TOPK/JOIN
        # surface, which replaces the brute-force operator — hold the
        # wider winnow margin that measures recall 1.0 on every corpus
        # (the raw serving default is the tighter k+2; BENCH_r04 keep
        # sweep documents the trade)
        return _scan_serve(
            q, g.vectors, allow, self.norms(), self.rerank_tape,
            g.slot_to_rowid, self.vector_scale, k, self.config.metric,
            2 * k, self.config.storage_dtype,
        )

    def slot_rowid_array(self) -> np.ndarray:
        """slot -> rowid tape, host copy (filtered-search mask surface)."""
        return np.asarray(self.graph.slot_to_rowid)

    # ------------------------------------------------------------- insert
    def _ensure_capacity(self, extra_slots: int, extra_upper: int):
        need = self.next_slot - len(self.free_slots) + extra_slots + _RESERVE
        new_cap = self.graph.capacity
        while new_cap < need:
            new_cap *= 2
        need_upper = self.upper_used + extra_upper + 1
        new_upper = self.graph.upper_capacity
        while new_upper < need_upper:
            new_upper *= 2
        if new_cap != self.graph.capacity or new_upper != self.graph.upper_capacity:
            self.graph = grow_graph(self.graph, self.config, new_cap, new_upper)
            if self.rerank_tape is not None:
                pad = new_cap - self.rerank_tape.shape[0]
                if pad > 0:
                    self.rerank_tape = jnp.pad(
                        self.rerank_tape, ((0, pad), (0, 0))
                    )

    def insert(self, vectors, rowids: Sequence[int]):
        """Insert vectors with user row ids (the INSERT/Append path).
        Tombstoned slots are recycled before new slots are claimed."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if self.config.storage_dtype == "int8":
            # out-of-range values clip in-wave; record the drift so
            # stats() can surface it and compact() can requantize
            if vectors.size:
                mx_rows = np.abs(vectors).max(axis=1)
                self.scale_max_abs = max(
                    self.scale_max_abs, float(mx_rows.max())
                )
                self.scale_overflow += int(
                    (mx_rows > self.vector_scale * 127.0).sum()
                )
            vectors = vectors / self.vector_scale
        rowids = np.asarray(rowids, np.int64)
        check_rowids_int32(rowids)
        n = vectors.shape[0]
        if n == 0:
            return
        for r in rowids:
            if int(r) in self.rowid_to_slot:
                raise ValueError(f"duplicate rowid {int(r)}")
        levels = sample_levels(n, self.config, seed=self._insert_seed)
        self._insert_seed += n
        self._ensure_capacity(n, int(levels.sum()))
        # assign slots: recycle tombstones first (free ring), then extend
        slots = np.empty(n, np.int64)
        reuse = min(len(self.free_slots), n)
        for i in range(reuse):
            slots[i] = self.free_slots.pop()
        if reuse < n:
            fresh = n - reuse
            slots[reuse:] = np.arange(self.next_slot, self.next_slot + fresh)
            self.next_slot += fresh
        # recycled slots stop being tombstones
        self.deleted_count -= reuse
        if self.rerank_tape is not None:
            self.rerank_tape = self.rerank_tape.at[
                jnp.asarray(slots.astype(np.int32))
            ].set(jnp.asarray(vectors, self.rerank_tape.dtype))
        # waves (bucketed shapes to bound recompilation)
        pos = 0
        while pos < n:
            W = next_pow2(n - pos, cap=1024)
            cnt = min(W, n - pos)
            wv = np.zeros((W, self.config.dims), np.float32)
            wv[:cnt] = vectors[pos : pos + cnt]
            sl = np.zeros(W, np.int32)
            sl[:cnt] = slots[pos : pos + cnt]
            # padding rows must scatter to distinct unused slots: point them
            # at reserved tail slots (never searched, never linked)
            if cnt < W:
                sl[cnt:] = self.graph.capacity - _RESERVE + (
                    np.arange(W - cnt) % (_RESERVE - 1)
                )
            lv = np.zeros(W, np.int32)
            lv[:cnt] = levels[pos : pos + cnt]
            urows, self.upper_used = plan_wave_rows(
                lv, self.upper_used, self.config.max_levels
            )
            rid = np.full(W, -1, np.int32)
            rid[:cnt] = rowids[pos : pos + cnt].astype(np.int32)
            self.graph = insert_wave(
                self.graph,
                self.config,
                jnp.asarray(wv),
                jnp.asarray(sl),
                jnp.asarray(lv),
                jnp.asarray(urows),
                jnp.asarray(rid),
                jnp.asarray(np.arange(W) < cnt),
                self.config.ef_construction,
                4,
                min(self.config.m, W),
            )
            for i in range(cnt):
                self.rowid_to_slot[int(rowids[pos + i])] = int(sl[i])
            pos += cnt
        self.dirty = True

    # ------------------------------------------------------------- delete
    def delete(self, rowids: Sequence[int]) -> int:
        """Tombstone rows. Returns number actually deleted."""
        slots = []
        for r in rowids:
            s = self.rowid_to_slot.pop(int(r), None)
            if s is not None:
                slots.append(s)
        if not slots:
            return 0
        sl = jnp.asarray(np.asarray(slots, np.int32))
        self.graph = dataclasses.replace(
            self.graph,
            valid=self.graph.valid.at[sl].set(False),
            count=self.graph.count - len(slots),
        )
        self.free_slots.extend(slots)
        self.deleted_count += len(slots)
        self.dirty = True
        return len(slots)

    # ------------------------------------------------------------- compact
    def compact(self):
        """Rewrite the graph without tombstones (PRAGMA hnsw_compact_index).

        Host-side permutation of the int adjacency arrays; the (large)
        vector tape is permuted on device. Edges into removed slots are
        dropped."""
        requantized = self._requantize_if_drifted()
        if self.deleted_count == 0 and not self.free_slots:
            if requantized:
                self.dirty = True
            return
        kept = np.flatnonzero(np.asarray(self.graph.valid))
        self._apply_slot_permutation(kept)

    def _requantize_if_drifted(self) -> bool:
        """Requantize the int8 tape from the f32 rerank side tape when
        inserts overflowed the build-time scale (scale-drift guard).
        Lossless for all stored values: the rerank tape holds the
        unclipped scaled f32 vectors. No reference counterpart — usearch
        has no quantized tape; this guards our int8 storage extension."""
        if (
            self.config.storage_dtype != "int8"
            or self.scale_overflow == 0
            or self.rerank_tape is None
        ):
            return False
        new_scale = self.scale_max_abs / 127.0
        if new_scale <= self.vector_scale:
            self.scale_overflow = 0
            return False
        ratio = self.vector_scale / new_scale
        rt = (self.rerank_tape * ratio).astype(self.rerank_tape.dtype)
        q = jnp.clip(jnp.round(rt), -127, 127).astype(jnp.int8)
        self.graph = dataclasses.replace(self.graph, vectors=q)
        self.rerank_tape = rt
        self.vector_scale = new_scale
        self.scale_overflow = 0
        self.dirty = True
        return True

    def optimize_layout(self, n_clusters: int = 1024, seed: int = 0):
        """Reorder slots so near neighbors sit adjacently in HBM — the
        locality intent of usearch's clustering compact()
        (`index.hpp:3405-3490`). Assigns every live vector to its nearest
        of `n_clusters` sampled vectors (one MXU pass) and permutes slots
        into cluster order. Improves gather locality for large graphs."""
        from vss_tpu.ops.topk import bruteforce_topk

        valid = np.asarray(self.graph.valid)
        live = np.flatnonzero(valid)
        if live.size == 0:
            return
        rng = np.random.default_rng(seed)
        n_clusters = int(min(n_clusters, live.size))
        centers_idx = rng.choice(live, n_clusters, replace=False)
        centers = jnp.take(
            self.graph.vectors, jnp.asarray(centers_idx.astype(np.int32)), axis=0
        ).astype(jnp.float32)
        assign = np.empty(live.size, np.int32)
        CH = 8192
        for s in range(0, live.size, CH):
            q = jnp.take(
                self.graph.vectors,
                jnp.asarray(live[s : s + CH].astype(np.int32)),
                axis=0,
            ).astype(jnp.float32)
            _, ids = bruteforce_topk(q, centers, 1, self.config.metric)
            assign[s : s + CH] = np.asarray(ids)[:, 0]
        order = np.argsort(assign, kind="stable")
        self._apply_slot_permutation(live[order])

    def _apply_slot_permutation(self, kept_in_order: np.ndarray):
        """Rebuild the graph with slots laid out as `kept_in_order` (old
        slot ids in their new order); everything not listed is dropped."""
        cfg = self.config
        levels = np.asarray(self.graph.levels)
        rowids = np.asarray(self.graph.slot_to_rowid)
        adj0 = np.asarray(self.graph.adj0)
        upper_adj = np.asarray(self.graph.upper_adj)
        upper_row = np.asarray(self.graph.upper_row)

        kept = np.asarray(kept_in_order, np.int64)
        n_new = kept.size
        cap = self.graph.capacity
        slot_map = np.full(cap, -1, np.int64)
        slot_map[kept] = np.arange(n_new)

        def remap(a):
            out = np.where(a >= 0, slot_map[np.maximum(a, 0)], -1)
            return out.astype(np.int32)

        new_adj0 = np.full((cap, cfg.m0), -1, np.int32)
        new_adj0[:n_new] = _compact_rows(remap(adj0[kept]))
        # upper rows: reassign compactly in kept order
        kept_levels = levels[kept]
        new_upper_used = int(kept_levels.sum())
        new_upper_cap = self.graph.upper_capacity
        new_upper_adj = np.full((new_upper_cap, cfg.m), -1, np.int32)
        new_upper_row = np.full((cap, cfg.max_levels), -1, np.int32)
        next_row = 0
        uppers = np.flatnonzero(kept_levels > 0)
        for i_new in uppers:
            old = kept[i_new]
            for l in range(1, int(levels[old]) + 1):
                src = upper_row[old, l - 1]
                if src >= 0:
                    new_upper_adj[next_row] = _compact_rows(
                        remap(upper_adj[src][None, :])
                    )[0]
                new_upper_row[i_new, l - 1] = next_row
                next_row += 1

        new_levels = np.zeros(cap, np.int32)
        new_levels[:n_new] = kept_levels
        new_valid = np.zeros(cap, bool)
        new_valid[:n_new] = True
        new_rowids = np.full(cap, -1, np.int32)
        new_rowids[:n_new] = rowids[kept]
        # entry: highest-level kept node (first in kept order on ties)
        if n_new:
            lv_max = int(kept_levels.max())
            entry = int(np.flatnonzero(kept_levels == lv_max)[0])
        else:
            lv_max, entry = -1, -1
        perm = jnp.asarray(
            np.concatenate([kept, np.zeros(cap - n_new, np.int64)]).astype(np.int32)
        )
        new_vectors = jnp.take(self.graph.vectors, perm, axis=0)
        new_vectors = jnp.where(
            (jnp.arange(cap) < n_new)[:, None], new_vectors, 0.0
        ).astype(self.graph.vectors.dtype)  # weak-f32 0.0 must not promote int8
        if self.rerank_tape is not None:
            rt = jnp.take(self.rerank_tape, perm, axis=0)
            self.rerank_tape = jnp.where(
                (jnp.arange(cap) < n_new)[:, None], rt, 0.0
            ).astype(self.rerank_tape.dtype)
        self.graph = HNSWGraph(
            vectors=new_vectors,
            adj0=jnp.asarray(new_adj0),
            upper_adj=jnp.asarray(new_upper_adj),
            upper_row=jnp.asarray(new_upper_row),
            levels=jnp.asarray(new_levels),
            valid=jnp.asarray(new_valid),
            slot_to_rowid=jnp.asarray(new_rowids),
            entry=jnp.int32(entry),
            max_level=jnp.int32(lv_max),
            count=jnp.int32(n_new),
        )
        self.upper_used = next_row
        self.next_slot = n_new
        self.free_slots = []
        self.deleted_count = 0
        self.rowid_to_slot = {int(r): i for i, r in enumerate(rowids[kept])}
        self.dirty = True

    # ------------------------------------------------------------- misc
    def rename(self, old_rowid: int, new_rowid: int) -> bool:
        """Re-key a row (usearch `rename`, index_dense.hpp:1310 analog)."""
        slot = self.rowid_to_slot.pop(int(old_rowid), None)
        if slot is None:
            return False
        if int(new_rowid) in self.rowid_to_slot:
            self.rowid_to_slot[int(old_rowid)] = slot
            raise ValueError(f"rowid {int(new_rowid)} already exists")
        self.rowid_to_slot[int(new_rowid)] = slot
        self.graph = dataclasses.replace(
            self.graph,
            slot_to_rowid=self.graph.slot_to_rowid.at[slot].set(
                np.int32(new_rowid)
            ),
        )
        self.dirty = True
        return True

    def vacuum(self):
        """No-op, matching the reference (`hnsw_index.cpp:596-597`):
        space reclamation happens via compact()."""

    def merge(self, other: "HNSWIndex"):
        """Unimplemented, matching the reference
        (`MergeIndexes`, `hnsw_index.cpp:592-594`)."""
        raise NotImplementedError("HNSWIndex::MergeIndexes() not implemented")

    def clone(self) -> "HNSWIndex":
        """Cheap copy (usearch `copy`/`fork` analog). Device arrays are
        immutable and shared; host bookkeeping is deep-copied."""
        other = HNSWIndex(self.config, capacity=64)
        other.graph = self.graph
        other.rerank_tape = self.rerank_tape
        other.vector_scale = self.vector_scale
        other.scale_max_abs = self.scale_max_abs
        other.scale_overflow = self.scale_overflow
        other.upper_used = self.upper_used
        other.next_slot = self.next_slot
        other.free_slots = list(self.free_slots)
        other.rowid_to_slot = dict(self.rowid_to_slot)
        other.deleted_count = self.deleted_count
        other.dirty = self.dirty
        other._insert_seed = self._insert_seed
        return other

    # ------------------------------------------------------------- stats
    def stats(self) -> dict:
        """Per-level stats for pragma_hnsw_index_info
        (`hnsw_index_pragmas.cpp:41-173` analog)."""
        valid = np.asarray(self.graph.valid)
        levels = np.asarray(self.graph.levels)
        adj0 = np.asarray(self.graph.adj0)
        upper_row = np.asarray(self.graph.upper_row)
        upper_adj = np.asarray(self.graph.upper_adj)
        n_levels = int(levels[valid].max()) + 1 if valid.any() else 0
        per_level = []
        row_bytes = self.config.dims * jnp.dtype(self.graph.vectors.dtype).itemsize
        for l in range(n_levels):
            members = np.flatnonzero(valid & (levels >= l))
            if l == 0:
                edges = int((adj0[members] >= 0).sum())
                max_edges = members.size * self.config.m0
                # per-node footprint at the base layer: adjacency row +
                # vector row + per-slot bookkeeping (valid/levels/rowid/
                # upper_row) — the analog of usearch's per-level
                # allocated_bytes (stats_t, index.hpp:2985-3050)
                alloc = int(members.size) * (
                    self.config.m0 * 4 + row_bytes + 1 + 4 + 4
                    + 4 * self.config.max_levels
                )
            else:
                rows = upper_row[members, l - 1]
                rows = rows[rows >= 0]
                edges = int((upper_adj[rows] >= 0).sum())
                max_edges = members.size * self.config.m
                alloc = int(rows.size) * self.config.m * 4
            per_level.append(
                {"level": l, "nodes": int(members.size), "edges": edges,
                 "max_edges": max_edges, "allocated_bytes": alloc}
            )
        bytes_graph = sum(
            int(np.asarray(getattr(self.graph, f.name)).nbytes)
            for f in dataclasses.fields(self.graph)
        )
        return {
            "metric": self.metric.value,
            "dimensions": self.config.dims,
            "count": self.count,
            "deleted": self.deleted_count,
            "capacity": self.usable_capacity,
            "connectivity": self.config.m,
            "connectivity_base": self.config.m0,
            "ef_construction": self.config.ef_construction,
            "ef_search": self.config.ef_search,
            "approx_memory_bytes": bytes_graph,
            "num_levels": n_levels,
            "levels": per_level,
            "quantization": {
                "scale": self.vector_scale,
                "max_abs_seen": self.scale_max_abs,
                "out_of_range_inserts": self.scale_overflow,
                "scale_drift": self.scale_overflow > 0,
            },
        }


def _compact_rows(rows: np.ndarray) -> np.ndarray:
    """Shift -1 holes in adjacency rows to the tail (keep order otherwise)."""
    order = np.argsort(rows < 0, axis=1, kind="stable")
    return np.take_along_axis(rows, order, axis=1)
