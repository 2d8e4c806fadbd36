"""Batched wave-based HNSW construction.

The reference builds its graph with one task per CPU thread all mutating a
shared structure under per-node bit-locks
(`/root/reference/src/hnsw/hnsw_index_physical_create.cpp:148-209`,
`usearch/index.hpp:2693-2773`). That shape is wrong for a TPU: there is no
shared mutable memory across a mesh and scalar insertion serializes the
MXU away. Instead, construction is *wave-based and functional*: a wave of
W nodes is inserted at once by pure array updates —

  1. write the wave's vectors/levels/metadata into the slot tape,
  2. batched greedy descent seeds every wave node at its target level,
  3. per level (static unroll, top→base): batched beam search over the
     pre-wave graph collects ef_construction candidates; intra-wave
     candidates (one W x W MXU tile) stand in for the not-yet-linked
     wave-mates; the batched select-neighbors heuristic picks M links,
  4. back-links are applied as one sort/segment pass: edges grouped by
     target, appended when there is room, re-selected with the heuristic
     on overflow (the analog of `connect_new_node_` +
     `reconnect_neighbor_nodes_`, `index.hpp:3655-3721`),
  5. entry point / max level / live count update.

Within a wave all nodes see the same pre-wave graph, so the result is
order-independent and deterministic given (seed, wave size). Graphs built
this way differ from sequentially-built ones — HNSW results are
approximate by contract; recall targets are enforced by tests/benchmarks.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vss_tpu.index.graph import (
    HNSWConfig,
    HNSWGraph,
    cast_to_tape,
    empty_graph,
    sample_levels,
)
from vss_tpu.index.search import beam_search_base, greedy_descent, _dedupe_keep_first
from vss_tpu.index.select import select_neighbors
from vss_tpu.ops.distance import gathered_distances, pairwise
from vss_tpu.utils import cdiv, round_up

__all__ = ["build_graph_batched", "insert_wave", "plan_wave_rows"]

_INF = float("inf")  # python scalar: no backend init at import
_IMAX = 2**31 - 1
_INCOMING_CAP = 16  # back-link fan-in accepted per target per wave


def _apply_backlinks_level(
    graph: HNSWGraph,
    config: HNSWConfig,
    slots: jax.Array,
    chosen: jax.Array,
    lev,
    active: jax.Array,
) -> jax.Array:
    """Merge wave->target edges back into targets' adjacency at `lev`.

    `lev` is the static int 0 (base layer; returns a new adj0) or a traced
    scalar >= 1 (upper layer; returns a new upper_adj)."""
    W, m = chosen.shape
    E = W * m
    base = isinstance(lev, int) and lev == 0
    cap = config.m0 if base else config.m
    dummy_slot = graph.capacity - 1
    dummy_row = graph.upper_capacity - 1

    src = jnp.repeat(slots, m)
    tgt = chosen.reshape(-1)
    ok_e = (tgt >= 0) & jnp.repeat(active, m)
    tgt_s = jnp.where(ok_e, tgt, _IMAX)
    iota = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)[:, 0]
    sorted_t, perm = jax.lax.sort_key_val(tgt_s, iota)
    src_sorted = jnp.take(src, perm)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_t[1:] != sorted_t[:-1]]
    )
    first_idx = jax.lax.cummax(jnp.where(seg_start, iota, 0))
    rank = iota - first_idx
    ok = (sorted_t != _IMAX) & (rank < _INCOMING_CAP)
    incoming = jnp.full((E + 1, _INCOMING_CAP), -1, jnp.int32)
    incoming = incoming.at[
        jnp.where(ok, first_idx, E), jnp.where(ok, rank, 0)
    ].set(jnp.where(ok, src_sorted, -1))
    incoming = incoming[:E]

    leader = seg_start & (sorted_t != _IMAX)
    t_slot = jnp.where(leader, sorted_t, -1)
    t_clamp = jnp.maximum(t_slot, 0)
    if base:
        exist = jnp.take(graph.adj0, t_clamp, axis=0)
    else:
        rows_all = jnp.take(graph.upper_row, t_clamp, axis=0)  # [E, Lmax]
        col = jnp.asarray(lev, jnp.int32) - 1
        trow = jnp.take_along_axis(
            rows_all, jnp.broadcast_to(col, (E,))[:, None], axis=1
        )[:, 0]
        leader = leader & (trow >= 0)
        exist = jnp.take(graph.upper_adj, jnp.maximum(trow, 0), axis=0)
    tv = jnp.take(graph.vectors, t_clamp, axis=0)

    cand_i = jnp.concatenate([exist, incoming], axis=1)  # [E, cap + P]
    cand_i = _dedupe_keep_first(cand_i)
    cand_d = gathered_distances(
        tv, jnp.take(graph.vectors, jnp.maximum(cand_i, 0), axis=0), config.metric
    )
    cand_d = jnp.where(cand_i >= 0, cand_d, _INF)

    cnt = jnp.sum(cand_i >= 0, axis=1)
    overflow = cnt > cap
    # heuristic re-selection (only meaningful on overflow rows)
    chosen_h = select_neighbors(
        tv, cand_i, cand_d, graph.vectors, cap, config.metric, active=leader & overflow
    )
    # plain append path == all candidates sorted ascending, truncated to cap
    neg_top, pos = jax.lax.top_k(-cand_d, cap)
    chosen_s = jnp.take_along_axis(cand_i, pos, axis=1)
    chosen_s = jnp.where(jnp.isfinite(-neg_top), chosen_s, -1)
    rows = jnp.where(overflow[:, None], chosen_h, chosen_s)

    if base:
        return graph.adj0.at[jnp.where(leader, t_slot, dummy_slot)].set(rows)
    return graph.upper_adj.at[
        jnp.where(leader, jnp.maximum(trow, 0), dummy_row)
    ].set(rows)


@functools.partial(
    jax.jit, static_argnames=("config", "efc", "expand", "intra_k", "fused")
)
def insert_wave(
    graph: HNSWGraph,
    config: HNSWConfig,
    wave_vecs: jax.Array,  # [W, d]
    slots: jax.Array,  # [W] i32, unique, none == capacity-1 (dummy)
    wave_levels: jax.Array,  # [W] i32
    wave_upper_rows: jax.Array,  # [W, Lmax] i32 (-1 = none)
    wave_rowids: jax.Array,  # [W] i32
    wave_valid: jax.Array,  # [W] bool (padding rows False)
    efc: int,
    expand: int = 4,
    intra_k: int = 16,
    fused: bool = False,
) -> HNSWGraph:
    """Insert one wave of nodes. Pure function; jits once per wave shape."""
    return _insert_wave_core(
        graph, config, wave_vecs, slots, wave_levels, wave_upper_rows,
        wave_rowids, wave_valid, efc, expand, intra_k, fused,
    )


def _insert_wave_core(
    graph, config, wave_vecs, slots, wave_levels, wave_upper_rows,
    wave_rowids, wave_valid, efc, expand=4, intra_k=16, fused=False,
) -> HNSWGraph:
    W = wave_vecs.shape[0]
    wave_vecs = wave_vecs.astype(jnp.float32)
    old_entry = graph.entry
    old_max = graph.max_level
    dummy_slot = graph.capacity - 1
    dummy_row = graph.upper_capacity - 1

    # ---- 1. write node data into the tapes (int8 tapes get scaled-unit
    # inputs from the caller; cast_to_tape rounds and clips)
    g = dataclasses.replace(
        graph,
        vectors=graph.vectors.at[slots].set(cast_to_tape(wave_vecs, config)),
        levels=graph.levels.at[slots].set(jnp.where(wave_valid, wave_levels, 0)),
        upper_row=graph.upper_row.at[slots].set(
            jnp.where(wave_valid[:, None], wave_upper_rows, -1)
        ),
        valid=graph.valid.at[slots].set(wave_valid),
        slot_to_rowid=graph.slot_to_rowid.at[slots].set(
            jnp.where(wave_valid, wave_rowids, -1)
        ),
    )
    occupied = g.slot_to_rowid >= 0
    # norms over the updated tape, shared by every beam this wave
    xv = g.vectors.astype(jnp.float32)
    x_norms = jnp.sum(xv * xv, axis=-1)
    q_norms = jnp.sum(wave_vecs * wave_vecs, axis=-1)

    # ---- 2. descend to each node's insertion level
    seeds, seed_d = greedy_descent(
        g, config, wave_vecs, stop_level=wave_levels,
        x_norms=x_norms, q_norms=q_norms,
    )
    has_entry = old_entry >= 0
    seeds = jnp.where(has_entry, seeds, -1)
    seed_d = jnp.where(has_entry, seed_d, _INF)

    # ---- intra-wave candidates: one W x W distance tile
    d_ww = pairwise(wave_vecs, wave_vecs, config.metric)
    eye = jnp.eye(W, dtype=jnp.bool_)
    d_ww = jnp.where(eye | ~wave_valid[None, :] | ~wave_valid[:, None], _INF, d_ww)

    # ---- 3. per-level: beam + select + write + backlink (top -> base).
    # Upper levels run inside one fori_loop with a traced level index so
    # the compiled program holds ONE copy of the level body, not Lmax.
    def level_step(g, lev, seeds, seed_d):
        """One level's work. lev: static 0 or traced >= 1. Returns the new
        adjacency array for that layer kind plus updated seeds."""
        base = isinstance(lev, int) and lev == 0
        active = wave_valid & (wave_levels >= lev)
        s = jnp.where(active, seeds, -1)
        sd = jnp.where(active & (seeds >= 0), seed_d, _INF)
        # construction admits every reachable node (tombstones included,
        # like the reference's insert-side search) -> single-pool beam
        res_d, res_i, _, _stats = beam_search_base(
            g, config, wave_vecs, s, sd, efc, occupied,
            expand=expand, level=lev, x_norms=x_norms, q_norms=q_norms,
            dual_pool=False, fused=fused,
        )
        # intra-wave mates present at this level
        d_lev = jnp.where((wave_levels >= lev)[None, :], d_ww, _INF)
        neg_top, pos = jax.lax.top_k(-d_lev, intra_k)
        intra_d = -neg_top
        intra_i = jnp.where(jnp.isfinite(intra_d), jnp.take(slots, pos), -1)
        cand_i = jnp.concatenate([res_i, intra_i], axis=1)
        cand_d = jnp.concatenate([res_d, intra_d], axis=1)
        chosen = select_neighbors(
            wave_vecs, cand_i, cand_d, g.vectors, config.m, config.metric, active
        )
        # write primary adjacency rows
        if base:
            rows0 = jnp.pad(
                chosen, ((0, 0), (0, config.m0 - config.m)), constant_values=-1
            )
            adj = g.adj0.at[jnp.where(active, slots, dummy_slot)].set(rows0)
            g = dataclasses.replace(g, adj0=adj)
        else:
            col = jnp.asarray(lev, jnp.int32) - 1
            urow = jnp.take_along_axis(
                wave_upper_rows, jnp.broadcast_to(col, (W,))[:, None], axis=1
            )[:, 0]
            ok_row = active & (urow >= 0)
            adj = g.upper_adj.at[
                jnp.where(ok_row, jnp.maximum(urow, 0), dummy_row)
            ].set(chosen)
            g = dataclasses.replace(g, upper_adj=adj)
        adj = _apply_backlinks_level(g, config, slots, chosen, lev, active)
        # best graph node found at this level seeds the next one down
        upd = active & (res_i[:, 0] >= 0)
        seeds = jnp.where(upd, res_i[:, 0], seeds)
        seed_d = jnp.where(upd, res_d[:, 0], seed_d)
        return adj, seeds, seed_d

    def upper_body(i, carry):
        lev = config.max_levels - i  # Lmax .. 1

        def do(carry):
            upper_adj, seeds, seed_d = carry
            g_cur = dataclasses.replace(g, upper_adj=upper_adj)
            return level_step(g_cur, lev, seeds, seed_d)

        # most waves have no nodes at high levels — skip the whole level
        # (beam + select + backlinks) when nothing is active there
        any_active = jnp.any(wave_valid & (wave_levels >= lev))
        return jax.lax.cond(any_active, do, lambda c: c, carry)

    upper_adj, seeds, seed_d = jax.lax.fori_loop(
        0, config.max_levels, upper_body, (g.upper_adj, seeds, seed_d)
    )
    g = dataclasses.replace(g, upper_adj=upper_adj)
    adj0, seeds, seed_d = level_step(g, 0, seeds, seed_d)
    g = dataclasses.replace(g, adj0=adj0)

    # ---- 4. entry / max level / count
    eff_lv = jnp.where(wave_valid, wave_levels, -1)
    wave_max = jnp.max(eff_lv)
    wave_arg = jnp.argmax(eff_lv)
    new_max = jnp.maximum(old_max, wave_max)
    promote = wave_max > old_max
    new_entry = jnp.where(promote, jnp.take(slots, wave_arg), old_entry)
    return dataclasses.replace(
        g,
        entry=new_entry.astype(jnp.int32),
        max_level=new_max.astype(jnp.int32),
        count=graph.count + jnp.sum(wave_valid).astype(jnp.int32),
    )


def plan_wave_rows(
    wave_levels: np.ndarray, next_row: int, max_levels: int
) -> tuple[np.ndarray, int]:
    """Assign compact upper_adj row ids for a wave's nodes (host side)."""
    lv = wave_levels.astype(np.int64)
    prefix = np.concatenate([[0], np.cumsum(lv)])[: len(lv)]
    col = np.arange(max_levels)[None, :]
    vals = next_row + prefix[:, None] + col
    rows = np.where(col < lv[:, None], vals, -1).astype(np.int32)
    return rows, next_row + int(lv.sum())


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "W", "n_waves", "efc", "expand", "intra_k", "fused"
    ),
    donate_argnames=("graph",),
)
def _build_segment(
    graph: HNSWGraph,
    config: HNSWConfig,
    vecs_pad: jax.Array,  # [n_pad, d] f32 (scaled units for int8 tapes)
    levels_pad: jax.Array,  # [n_pad] i32
    urows_pad: jax.Array,  # [n_pad, Lmax] i32
    rowids_pad: jax.Array,  # [n_pad] i32 (-1 padding)
    valid_pad: jax.Array,  # [n_pad] bool
    w_start: jax.Array,  # i32 scalar: first wave index of this segment
    W: int,
    n_waves: int,
    efc: int,
    expand: int,
    intra_k: int,
    fused: bool = False,
) -> HNSWGraph:
    """Insert `n_waves` consecutive waves in ONE device program.

    The per-wave host round trip (upload + dispatch) costs ~100ms through
    a tunneled device — 977 waves of that dwarfs the actual compute. With
    all build inputs device-resident, a `fori_loop` over waves makes the
    whole segment a single dispatch."""

    def body(i, g):
        s0 = (w_start + i) * W
        wv = jax.lax.dynamic_slice_in_dim(vecs_pad, s0, W).astype(jnp.float32)
        lv = jax.lax.dynamic_slice_in_dim(levels_pad, s0, W)
        ur = jax.lax.dynamic_slice_in_dim(urows_pad, s0, W)
        rid = jax.lax.dynamic_slice_in_dim(rowids_pad, s0, W)
        va = jax.lax.dynamic_slice_in_dim(valid_pad, s0, W)
        slots = s0 + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
        return _insert_wave_core(
            g, config, wv, slots, lv, ur, rid, va, efc, expand, intra_k,
            fused,
        )

    return jax.lax.fori_loop(0, n_waves, body, graph)


def build_graph_batched(
    vectors,
    config: HNSWConfig,
    *,
    seed: int = 0,
    wave_size: int = 1024,
    rowids: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    efc: Optional[int] = None,
    expand: int = 4,
    intra_k: Optional[int] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    waves_per_dispatch: int = 64,
    fused: Optional[bool] = None,
) -> tuple[HNSWGraph, int]:
    """Build a graph over `vectors` [n, d] with fixed-size insert waves,
    executed as device-resident segments of `waves_per_dispatch` waves per
    dispatch (all inputs uploaded once).

    Returns (graph, upper_rows_used). Deterministic given `seed`.
    The last slot of the allocated capacity is reserved as a scatter sink
    and is never assigned to data.
    """
    vectors = np.asarray(vectors, np.float32)
    n, d = vectors.shape
    assert d == config.dims
    W = max(1, min(wave_size, n))
    efc = efc or config.ef_construction
    intra_k = intra_k or min(config.m, W)
    levels = sample_levels(n, config, seed)
    cap_needed = round_up(n, W) + 8
    capacity = max(capacity or 0, cap_needed)
    upper_cap = int(levels.sum()) + 64 + 1
    graph = empty_graph(config, capacity, upper_cap)
    if rowids is None:
        rowids = np.arange(n, dtype=np.int32)

    n_waves = cdiv(n, W)
    n_pad = n_waves * W
    vecs_pad = np.zeros((n_pad, d), np.float32)
    vecs_pad[:n] = vectors
    levels_pad = np.zeros(n_pad, np.int32)
    levels_pad[:n] = levels
    urows_pad, next_row = plan_wave_rows(levels_pad, 0, config.max_levels)
    rowids_pad = np.full(n_pad, -1, np.int32)
    rowids_pad[:n] = np.asarray(rowids, np.int64).astype(np.int32)
    valid_pad = np.arange(n_pad) < n

    args = [
        jnp.asarray(vecs_pad),
        jnp.asarray(levels_pad),
        jnp.asarray(urows_pad),
        jnp.asarray(rowids_pad),
        jnp.asarray(valid_pad),
    ]
    if fused is None:
        from vss_tpu.index.search import _default_fused

        fused = _default_fused(graph)
    done = 0
    for w0 in range(0, n_waves, waves_per_dispatch):
        seg = min(waves_per_dispatch, n_waves - w0)
        graph = _build_segment(
            graph, config, *args, jnp.int32(w0), W, seg, efc, expand,
            intra_k, fused,
        )
        done = min((w0 + seg) * W, n)
        if progress is not None:
            progress(done, n)
    return graph, next_row
