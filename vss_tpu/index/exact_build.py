"""MXU-native bulk construction: exact-kNN candidates + batched refine.

The reference constructs its graph incrementally — every insert runs a
beam search over the partially-built graph
(`/root/reference/src/include/usearch/index.hpp:2693-2773` `add()`,
`:3855-3922` `search_to_insert_`), because on a CPU that is the only way
to avoid O(n^2) distance work. On a TPU the economics invert: the MXU
computes a 2048x65536 distance tile in well under a millisecond, so the
*exact* top-C neighbors of every node — the thing the insert-side beam
search only approximates — are affordable as a handful of big matmuls.

Construction therefore becomes three data-parallel passes, none of which
touch the graph being built (no insertion order, no locks, no waves):

  1. candidates: for every node, exact top-C nearest nodes by tiled
     brute force (`lax.approx_min_k` per tile on TPU — the hardware
     PartialReduce top-k — merged exactly across tiles),
  2. refine: the reference's diversity heuristic (`refine_`,
     `index.hpp:4030-4077`) applied to each node's candidate list in
     batched form (`index/select.py`) -> forward adjacency,
  3. backlinks: reverse edges merged under the degree cap with heuristic
     re-selection on overflow (the `connect_new_node_` /
     `reconnect_neighbor_nodes_` analog, `index.hpp:3655-3721`),
     applied in node chunks.

Upper levels use the same recipe on the (geometrically smaller) level
subsets, so hierarchy semantics — level sampling, entry point, greedy
descent routing — are identical to the wave builder's.

Because the candidate lists are exact, the resulting graph is what HNSW
construction converges toward as ef_construction -> n: recall at equal
search effort is >= the incremental build's. Used for bulk CREATE INDEX;
incremental inserts still use the wave path (`index/build.py`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vss_tpu.index.build import plan_wave_rows
from vss_tpu.index.graph import (
    HNSWConfig,
    HNSWGraph,
    cast_to_tape,
    empty_graph,
    sample_levels,
)
from vss_tpu.index.select import select_neighbors
from vss_tpu.ops.distance import Metric, _epilogue
from vss_tpu.utils import cdiv, round_up

__all__ = ["build_graph_exact", "exact_knn"]

_INF = float("inf")


def _dist_tile(q, x, metric: Metric, precision):
    """[bq, d] x [tx, d] -> [bq, tx] distances at the given matmul
    precision (DEFAULT = bf16 MXU passes: candidate *ordering* is all
    construction needs; exact user-facing distances are recomputed by the
    query layer at HIGHEST, see ops/distance.py)."""
    dots = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    xn = jnp.sum(x * x, axis=-1, keepdims=True).T
    return _epilogue(dots, qn, xn, metric)


@functools.partial(
    jax.jit,
    static_argnames=(
        "C", "metric_name", "tile", "block", "approx", "fast_matmul",
        "dist_bf16",
    ),
)
def _knn_all(
    q_pad, q_ids, x, x_valid, C, metric_name, tile, block, approx,
    fast_matmul, dist_bf16=False,
):
    """Exact top-C neighbors of every row of `q_pad` [nq_pad, d]
    (nq_pad % block == 0) over `x` [nx_pad, d] (nx_pad % tile == 0),
    excluding self-matches (x row id == q_ids entry, pad ids < 0 never
    match) and invalid x rows. The whole (query-block x db-tile) sweep
    runs as ONE device program — eager per-block dispatch costs ~100ms
    each through a tunneled device, which would dominate the matmuls.

    dist_bf16: materialize the [block, tile] distance matrix in bf16 —
    the pass is HBM-bound on that buffer, so this halves its traffic.
    Candidate ORDERING is all construction consumes, and near-tie
    shuffles within bf16 resolution are indistinguishable from the
    bf16-input rounding the matmul already has. Exact distances are
    recomputed downstream (refine/backlinks score at f32).

    Returns (dists [nq_pad, C] ascending f32, ids [nq_pad, C], -1
    padded)."""
    metric = Metric.parse(metric_name)
    n_tiles = x.shape[0] // tile
    n_blocks = q_pad.shape[0] // block
    xt = x.reshape(n_tiles, tile, x.shape[1])
    vt = x_valid.reshape(n_tiles, tile)
    prec = (
        jax.lax.Precision.DEFAULT if fast_matmul else jax.lax.Precision.HIGHEST
    )
    dd = jnp.bfloat16 if dist_bf16 else jnp.float32

    def one_block(q, ids_b):
        def step(carry, inp):
            best_d, best_i = carry
            x_tile, v_tile, t_idx = inp
            d = _dist_tile(q, x_tile, metric, prec).astype(dd)  # [block, tile]
            # mask invalid columns and each query's own row WITHOUT
            # materializing a [block, tile] i32 id matrix (it cost an
            # extra ~1 TB of HBM traffic per 1M-row pass): compare the
            # column iota against the query's tile-local self index
            self_col = ids_b - t_idx * tile  # [block], outside tile -> no match
            iota = jax.lax.broadcasted_iota(jnp.int32, (block, tile), 1)
            bad = ~v_tile[None, :] | (iota == self_col[:, None])
            d = jnp.where(bad, jnp.asarray(_INF, dd), d)
            if approx:
                td, tp = jax.lax.approx_min_k(d, C, recall_target=0.98)
            else:
                neg, tp = jax.lax.top_k(-d, C)
                td = -neg
            ti = t_idx * tile + tp  # positions ARE tile-local ids
            # exact merge of the running best with this tile's winners
            cat_d = jnp.concatenate([best_d, td], axis=1)
            cat_i = jnp.concatenate([best_i, ti.astype(jnp.int32)], axis=1)
            sd, si = jax.lax.sort((cat_d, cat_i), dimension=1, num_keys=1)
            return (sd[:, :C], si[:, :C]), None

        init = (
            jnp.full((block, C), _INF, dd),
            jnp.full((block, C), -1, jnp.int32),
        )
        (bd, bi), _ = jax.lax.scan(
            step, init, (xt, vt, jnp.arange(n_tiles, dtype=jnp.int32))
        )
        bd = bd.astype(jnp.float32)
        return bd, jnp.where(jnp.isfinite(bd), bi, -1)

    def body(b, out):
        out_d, out_i = out
        s0 = b * block
        qb = jax.lax.dynamic_slice_in_dim(q_pad, s0, block)
        ib = jax.lax.dynamic_slice_in_dim(q_ids, s0, block)
        bd, bi = one_block(qb, ib)
        return (
            jax.lax.dynamic_update_slice(out_d, bd, (s0, 0)),
            jax.lax.dynamic_update_slice(out_i, bi, (s0, 0)),
        )

    out = (
        jnp.full((q_pad.shape[0], C), _INF, jnp.float32),
        jnp.full((q_pad.shape[0], C), -1, jnp.int32),
    )
    return jax.lax.fori_loop(0, n_blocks, body, out)


def exact_knn(
    vecs: jax.Array,
    ids: jax.Array,
    C: int,
    metric,
    *,
    block: int = 2048,
    tile: int = 65536,
    fast_matmul: bool = True,
    dist_bf16: Optional[bool] = None,
    n_valid: Optional[int] = None,
    progress: Optional[Callable[[int, int], None]] = None,
):
    """Exact top-C neighbor lists for every row of `vecs` [n, d] against
    all rows (self excluded). `ids` [n] are the global ids reported (and
    matched for self-exclusion). Returns host-free device arrays
    (dists [n, C], ids [n, C]). `dist_bf16` defaults to on-TPU (see
    `_knn_all`; CPU keeps f32 so oracle-comparison tests stay exact).
    `n_valid`: rows past it are shape padding — excluded as neighbor
    columns (their own output rows are garbage the caller must drop);
    lets callers pad `n` to a bucketed shape for compiled-program reuse.
    """
    from vss_tpu.utils import use_pallas  # TPU detection, test-overridable

    metric = Metric.parse(metric)
    if dist_bf16 is None:
        dist_bf16 = use_pallas() and fast_matmul
    n, d = vecs.shape
    if n_valid is None:
        n_valid = n
    # C is SHAPE-based (padded callers keep a bucketed width; missing
    # neighbors come back as -1/inf), only bounded by the row count
    C = min(C, max(n - 1, 1))
    tile = min(tile, round_up(n, 512))
    block = min(block, round_up(n, 256))
    n_pad = round_up(n, tile)
    x = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(
        vecs.astype(jnp.float32)
    )
    x_valid = (jnp.arange(n_pad) < n_valid)
    nq_pad = round_up(n, block)
    if nq_pad <= n_pad:
        q_pad = x[:nq_pad]
    else:
        q_pad = jnp.zeros((nq_pad, d), jnp.float32).at[:n].set(x[:n])
    q_ids = jnp.full((nq_pad,), -2, jnp.int32).at[:n].set(
        ids.astype(jnp.int32)
    )
    approx = use_pallas() and C <= tile // 8
    if progress is not None:
        progress(0, n)
    # Chunk the query axis eagerly: one fori program over ALL blocks runs
    # ~3x slower than a stream of medium-sized programs (measured at 1M —
    # XLA pipelines consecutive dispatches but serializes a monolithic
    # loop), while per-2048-block eager dispatch pays ~100ms relay
    # latency per op at small n. 16k-query programs are the sweet spot.
    eager_chunk = max(block, min(8 * block, nq_pad))
    if nq_pad <= eager_chunk:
        out_d, out_i = _knn_all(
            q_pad, q_ids, x, x_valid, C, metric.value, tile, block,
            approx, fast_matmul, dist_bf16,
        )
    else:
        parts_d, parts_i, ends = [], [], []
        # keep a few chunks in flight (XLA pipelines consecutive
        # dispatches), but lag the progress callback behind COMPLETED
        # chunks — dispatch returns long before the device finishes, and
        # truthful progress is what external stall watchdogs key on
        lag = 3
        for s in range(0, nq_pad, eager_chunk):
            e = min(s + eager_chunk, nq_pad)
            qc = q_pad[s:e]
            ic = q_ids[s:e]
            if e - s < eager_chunk:
                qc = jnp.pad(qc, ((0, eager_chunk - (e - s)), (0, 0)))
                ic = jnp.pad(ic, (0, eager_chunk - (e - s)), constant_values=-2)
            od, oi = _knn_all(
                qc, ic, x, x_valid, C, metric.value, tile, block, approx,
                fast_matmul, dist_bf16,
            )
            parts_d.append(od[: e - s])
            parts_i.append(oi[: e - s])
            ends.append(min(e, n))
            if progress is not None and len(parts_i) > lag:
                jax.block_until_ready(parts_i[-1 - lag])
                progress(ends[-1 - lag], n)
        out_d = jnp.concatenate(parts_d)
        out_i = jnp.concatenate(parts_i)
    if progress is not None:
        progress(n, n)
    return out_d[:n], out_i[:n]


@functools.partial(
    jax.jit, static_argnames=("config", "cap", "chunk"), donate_argnames=("adj",)
)
def _refine_forward(adj, vectors, cand_d, cand_i, node_slots, config, cap, chunk):
    """Apply the select-neighbors heuristic to every node's candidate
    list, chunked; writes rows of `adj` (width >= cap, -1 padded)."""
    A = cand_i.shape[0]
    n_chunks = A // chunk
    pad_w = adj.shape[1] - cap

    def body(c, adj):
        s0 = c * chunk
        ci = jax.lax.dynamic_slice_in_dim(cand_i, s0, chunk)
        cd = jax.lax.dynamic_slice_in_dim(cand_d, s0, chunk)
        sl = jax.lax.dynamic_slice_in_dim(node_slots, s0, chunk)
        qv = jnp.take(vectors, sl, axis=0).astype(jnp.float32)
        chosen = select_neighbors(qv, ci, cd, vectors, cap, config.metric)
        rows = jnp.pad(chosen, ((0, 0), (0, pad_w)), constant_values=-1)
        return adj.at[sl].set(rows)

    return jax.lax.fori_loop(0, n_chunks, body, adj)


@functools.partial(jax.jit, static_argnames=("config",))
def _upper_select(sd, si_local, mslots, tape_f32, config):
    """Map an upper level's subset-local kNN lists to global slots and
    run the refine heuristic — traced inside the level pass (eager
    op-by-op dispatch through a tunneled device costs ~100ms/op).
    Chunked over members: the [A, C, d] candidate gather inside
    select_neighbors is 8 GB at A=64k, C=32, d=960 (round-5 HBM OOM)."""
    A_pad, C = si_local.shape

    def one(args):
        sd_b, si_b, ms_b = args
        si = jnp.where(
            si_b >= 0, jnp.take(mslots, jnp.maximum(si_b, 0)), -1
        )
        qv = jnp.take(tape_f32, ms_b, axis=0)
        return select_neighbors(qv, si, sd_b, tape_f32, config.m,
                                config.metric)

    sel_chunk = 2048
    if A_pad <= sel_chunk or A_pad % sel_chunk:
        return one((sd, si_local, mslots))
    nb = A_pad // sel_chunk
    out = jax.lax.map(
        one,
        (
            sd.reshape(nb, sel_chunk, C),
            si_local.reshape(nb, sel_chunk, C),
            mslots.reshape(nb, sel_chunk),
        ),
    )
    return out.reshape(A_pad, -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "C", "tile", "block", "approx", "dist_bf16", "chunk",
    ),
    donate_argnames=("upper_adj",),
)
def _upper_level_pass(
    tape_f32,     # [cap, d] f32 slot tape (pad slots are zeros)
    mslots,       # [A_pad] i32 level members SORTED asc, pad = cap-1
    n_valid,      # i32 scalar: members < n_valid-th position are real
    rows_idx,     # [A_pad] i32 upper_adj rows, -1 for pads
    upper_adj,    # the graph's upper adjacency (donated)
    config,
    C: int,
    tile: int,
    block: int,
    approx: bool,
    dist_bf16: bool,
    chunk: int,
):
    """One whole upper level as ONE device program: subset gather →
    exact kNN → refine-select → forward scatter → reverse-edge grouping →
    backlink merge. Shapes are pow2-bucketed by the caller, so every
    level (and every future build) reuses a handful of compiled programs;
    run eagerly, the ~20 glue ops cost ~100 ms relay dispatch EACH per
    level through the tunneled device (~4 s per tiny level at 1M)."""
    A_pad = mslots.shape[0]
    sub = jnp.take(tape_f32, mslots, axis=0)
    pos = jnp.arange(A_pad, dtype=jnp.int32)
    x_valid = pos < n_valid
    sd, si_local = _knn_all(
        sub, pos, sub, x_valid, C, config.metric, tile, block, approx,
        True, dist_bf16,
    )
    row_ok = x_valid[:, None]
    sd = jnp.where(row_ok, sd, _INF)
    si_local = jnp.where(row_ok, si_local, -1)
    chosen = _upper_select(sd, si_local, mslots, tape_f32, config)
    sink_row = upper_adj.shape[0] - 1
    upper_adj = upper_adj.at[
        jnp.where(rows_idx >= 0, rows_idx, sink_row)
    ].set(chosen)
    incoming = _group_incoming_local(mslots, chosen)
    return _merge_backlinks(
        upper_adj, rows_idx, tape_f32, incoming, mslots, config,
        config.m, chunk,
    )


_INCOMING_CAP = 16  # reverse-edge fan-in accepted per target (one pass)


@functools.partial(jax.jit, static_argnames=("cap_rows", "cap"))
def _group_incoming(node_slots, forward, cap_rows: int, cap: int = _INCOMING_CAP):
    """Group reverse edges by target: returns incoming [cap_rows, cap]
    i32 (-1 padded), where incoming[t] lists up to `cap` sources that
    chose slot t as a forward neighbor. One global sort of all A*m edges
    — the TPU-shaped replacement for the reference's per-insert
    `reconnect_neighbor_nodes_` walks. Also reused by index/repair.py as
    a device-side reverse adjacency for reachability sweeps."""
    A, m = forward.shape
    E = A * m
    src = jnp.repeat(node_slots, m)
    tgt = forward.reshape(-1)
    tgt_s = jnp.where(tgt >= 0, tgt, jnp.int32(2**31 - 1))
    iota = jnp.arange(E, dtype=jnp.int32)
    sorted_t, perm = jax.lax.sort_key_val(tgt_s, iota)
    src_sorted = jnp.take(src, perm)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_t[1:] != sorted_t[:-1]]
    )
    first_idx = jax.lax.cummax(jnp.where(seg_start, iota, 0))
    rank = iota - first_idx
    ok = (sorted_t != 2**31 - 1) & (rank < cap)
    incoming = jnp.full((cap_rows + 1, cap), -1, jnp.int32)
    incoming = incoming.at[
        jnp.where(ok, sorted_t, cap_rows), jnp.where(ok, rank, 0)
    ].set(jnp.where(ok, src_sorted, -1))
    return incoming[:cap_rows]


@functools.partial(
    jax.jit, static_argnames=("config", "cap", "chunk"), donate_argnames=("adj",)
)
def _merge_backlinks(
    adj, adj_rows, vectors, incoming, node_slots, config, cap, chunk
):
    """Per-target merge of (existing forward links ∪ incoming reverse
    edges) under the degree cap: plain distance-sorted append when the
    union fits, heuristic re-selection on overflow — the analog of
    `connect_new_node_` / `reconnect_neighbor_nodes_`
    (`/root/reference/src/include/usearch/index.hpp:3655-3721`).

    adj: the layer's adjacency array (rows indexed by `adj_rows`);
    node_slots: the targets' slots (vector lookup); chunked fori_loop.
    """
    from vss_tpu.index.search import _dedupe_keep_first
    from vss_tpu.ops.distance import gathered_distances

    A = node_slots.shape[0]
    n_chunks = A // chunk
    pad_w = adj.shape[1] - cap

    def body(c, adj):
        s0 = c * chunk
        rows_i = jax.lax.dynamic_slice_in_dim(adj_rows, s0, chunk)
        sl = jax.lax.dynamic_slice_in_dim(node_slots, s0, chunk)
        inc = jax.lax.dynamic_slice_in_dim(incoming, s0, chunk)
        exist = jnp.take(adj, jnp.maximum(rows_i, 0), axis=0)[:, :cap]
        cand_i = _dedupe_keep_first(jnp.concatenate([exist, inc], axis=1))
        tv = jnp.take(vectors, sl, axis=0).astype(jnp.float32)
        cv = jnp.take(vectors, jnp.maximum(cand_i, 0), axis=0)
        cand_d = gathered_distances(tv, cv, config.metric)
        cand_d = jnp.where(cand_i >= 0, cand_d, _INF)
        cnt = jnp.sum(cand_i >= 0, axis=1)
        overflow = cnt > cap
        chosen_h = select_neighbors(
            tv, cand_i, cand_d, vectors, cap, config.metric,
            active=overflow, cand_vecs=cv,
        )
        neg_top, pos = jax.lax.top_k(-cand_d, cap)
        chosen_s = jnp.take_along_axis(cand_i, pos, axis=1)
        chosen_s = jnp.where(jnp.isfinite(-neg_top), chosen_s, -1)
        rows = jnp.where(overflow[:, None], chosen_h, chosen_s)
        if pad_w:
            rows = jnp.pad(rows, ((0, 0), (0, pad_w)), constant_values=-1)
        sink = adj.shape[0] - 1
        return adj.at[jnp.where(rows_i >= 0, rows_i, sink)].set(rows)

    return jax.lax.fori_loop(0, n_chunks, body, adj)


@functools.partial(jax.jit, static_argnames=("cap",))
def _group_incoming_local(node_slots, forward, cap: int = _INCOMING_CAP):
    """`_group_incoming` in the LEVEL-LOCAL id space: node_slots [A]
    must be sorted ascending (np.where / arange order — both callers).
    Targets outside the level map to -1. Avoids the capacity-sized
    [cap_rows+1, cap] scatter the global version pays — at 1M capacity
    that was a 64 MB allocation per (tiny) upper level."""
    A, m = forward.shape
    tgt = forward.reshape(-1)
    loc = jnp.searchsorted(node_slots, jnp.maximum(tgt, 0))
    hit = (
        (tgt >= 0)
        & (loc < A)
        & (jnp.take(node_slots, jnp.minimum(loc, A - 1)) == tgt)
    )
    local_fwd = jnp.where(hit, loc, -1).reshape(A, m).astype(jnp.int32)
    return _group_incoming(node_slots, local_fwd, A, cap)


def _backlink_pass(
    graph: HNSWGraph,
    config: HNSWConfig,
    node_slots: jax.Array,  # [A] i32 targets == sources, SORTED ascending
    adj_rows: jax.Array,  # [A] i32 rows of the layer adjacency array
    forward: jax.Array,  # [A, m] i32 forward links (pre-backlink)
    tape_f32: jax.Array,
    lev: int,
    chunk: int,
) -> HNSWGraph:
    adj = graph.adj0 if lev == 0 else graph.upper_adj
    cap = config.m0 if lev == 0 else config.m
    # grouped in level-local order == per-target list order
    incoming = _group_incoming_local(node_slots, forward)
    A = node_slots.shape[0]
    chunk = min(chunk, round_up(A, 256))
    n_chunks = cdiv(A, chunk)
    A_pad = n_chunks * chunk
    pad = A_pad - A
    sink = graph.capacity - 1
    adj = _merge_backlinks(
        adj,
        jnp.pad(adj_rows, (0, pad), constant_values=-1),
        tape_f32,
        jnp.pad(incoming, ((0, pad), (0, 0)), constant_values=-1),
        jnp.pad(node_slots, (0, pad), constant_values=sink),
        config,
        cap,
        chunk,
    )
    if lev == 0:
        return dataclasses.replace(graph, adj0=adj)
    return dataclasses.replace(graph, upper_adj=adj)


# past this row count 'auto' switches the base-layer candidate pass off
# the n^2 _knn_all sweep: its top-C selection width scales with n and
# dominates the 1M build profile. On TPU the replacement is the
# storage-native segmin scan ('scan' mode below — EXACT lists, ~30x
# cheaper selection); off-TPU it is IVF-window blocking
# (index/ivf_candidates.py, approximate and locality-dependent).
_IVF_AUTO_MIN_N = 131_072


def scan_candidates(
    xv: jax.Array,          # [n, d] f32 queries (scaled units)
    tape: jax.Array,        # [cap, d] stored tape (int8/bf16/f32)
    valid: jax.Array,       # [cap] bool
    x_norms: jax.Array,     # [cap] f32 squared norms of stored values
    C: int,
    metric,
    *,
    batch: int = 8192,
    keep_margin: int = 16,
    progress: Optional[Callable[[int, int], None]] = None,
):
    """Near-exact top-C candidate lists for every row via the serving
    scan (`ops/scan.scan_topk`): segment-minima winnow + block rescore +
    f32 rerank. Distribution-agnostic by construction — the round-4
    answer to the IVF pass's iid collapse (recall@10 = 0.095 at 1M x
    128) — with selection ~30x cheaper than `_knn_all`'s sort-merge at
    1M ("near": the winnow keeps C+keep_margin segments, so a tail
    candidate can miss when > keep_margin of the true top-C share
    crowded segments; measured list recall vs the oracle is ~1.0 and
    refine/backlinks re-score downstream).

    Returns (dists [n, C] ascending f32 w.r.t. `xv`, ids [n, C] i32
    slot ids, self excluded as -1). k is capped at SCAN_K_MAX; callers
    size C accordingly.
    """
    from vss_tpu.ops.scan import SCAN_K_MAX, scan_topk

    metric = Metric.parse(metric)
    n, d = xv.shape
    C = min(C, SCAN_K_MAX, max(n - 1, 1))
    parts_d, parts_i = [], []
    lag = 3
    ends = []
    for s in range(0, n, batch):
        e = min(s + batch, n)
        q = xv[s:e]
        if e - s < batch:
            q = jnp.pad(q, ((0, batch - (e - s)), (0, 0)))
        # keep = C + margin (vs the serving default 2C): the pass is
        # gather-bound on keep*128 rescore rows per query (2.1 TB at 1M
        # with keep=2C=128) and candidate LISTS tolerate the slightly
        # less exact tail — refine/backlinks re-score downstream
        bd, bi = scan_topk(
            q, tape, C, metric, valid_mask=valid, x_norms=x_norms,
            rerank_tape=xv, keep=C + keep_margin,
        )
        # drop self-matches (each row is its own nearest): refine
        # downstream treats interior -1s as absent
        self_ids = s + jnp.arange(batch, dtype=jnp.int32)
        bi = jnp.where(bi == self_ids[:, None], -1, bi)
        parts_d.append(bd[: e - s])
        parts_i.append(bi[: e - s])
        ends.append(e)
        if progress is not None and len(parts_i) > lag:
            jax.block_until_ready(parts_i[-1 - lag])
            progress(ends[-1 - lag], n)
    out_d = jnp.concatenate(parts_d)
    out_i = jnp.concatenate(parts_i)
    if progress is not None:
        progress(n, n)
    return out_d, jnp.where(out_i >= 0, out_i, -1)


def build_graph_exact(
    vectors,
    config: HNSWConfig,
    *,
    seed: int = 0,
    rowids: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    candidates: Optional[int] = None,
    block: int = 2048,
    tile: int = 65536,
    backlink_chunk: int = 4096,
    candidate_mode: str = "auto",
    want_rerank: bool = False,
    prescale: float = 1.0,
    progress: Optional[Callable[[int, int], None]] = None,
):
    """Bulk-build an HNSW graph from exact kNN candidate lists.

    Returns (graph, upper_rows_used) — or (graph, upper_rows_used,
    rerank_tape) with `want_rerank=True`: the full-precision rescore
    side tape is built from the f32 device copy this function already
    holds, so callers skip a second ~0.5 GB host->device upload through
    the relay (measured ~38 s of the 1M warm build — the round-3 "post-
    build tail" regression). Deterministic given `seed` (level sampling
    is the only randomness; candidate generation and refine are pure).

    `candidates` is C, the exact-neighbor list length refined down to the
    degree caps (default: 2*m0 at the base layer, bounded below by m0+8).

    `candidate_mode`: 'exact' (n^2 top-C), 'ivf' (locality-blocked, see
    index/ivf_candidates.py), or 'auto' (ivf past _IVF_AUTO_MIN_N rows;
    VSS_CAND_MODE overrides). Upper levels are geometrically small and
    always use the exact pass.
    """
    # device arrays stay on device (multi-GB host round-trips wedge the
    # relay — see HNSWIndex.build); everything host-side below only
    # needs n and the level sample
    if not isinstance(vectors, jax.Array):
        vectors = np.asarray(vectors, np.float32)
    n, d = vectors.shape
    assert d == config.dims
    levels = sample_levels(n, config, seed)
    cap_needed = n + 8
    capacity = max(capacity or 0, cap_needed)
    urows, next_row = plan_wave_rows(levels, 0, config.max_levels)
    upper_cap = next_row + 64 + 1
    graph = empty_graph(config, capacity, upper_cap)
    if rowids is None:
        rowids = np.arange(n, dtype=np.int32)
    rowids = np.asarray(rowids, np.int64).astype(np.int32)
    if n == 0:
        return graph, 0

    import os
    import sys
    import time as _time

    _dbg = os.environ.get("VSS_EXACT_DEBUG") == "1"
    _t0 = _time.perf_counter()

    def _mark(label, *arrs):
        if _dbg:
            for a in arrs:
                jax.block_until_ready(a)
            print(
                f"[exact_build] {label}: {_time.perf_counter() - _t0:.1f}s",
                file=sys.stderr, flush=True,
            )

    entry_slot = int(np.argmax(levels))
    # prescale != 1: `vectors` arrives UNSCALED and the divide fuses
    # into the tape cast — materializing a separate scaled f32 copy was
    # one of the five near-corpus-size arrays that OOM'd HBM on the
    # 1M x 960 build (round 5; 16 GB chip)
    xv = jnp.asarray(vectors)
    slots = jnp.arange(n, dtype=jnp.int32)
    tape_vals = (
        jax.jit(lambda v: cast_to_tape(v / prescale, config))(xv)
        if prescale != 1.0
        else cast_to_tape(xv, config)
    )
    graph = dataclasses.replace(
        graph,
        vectors=graph.vectors.at[:n].set(tape_vals),
        levels=graph.levels.at[:n].set(jnp.asarray(levels)),
        upper_row=graph.upper_row.at[:n].set(jnp.asarray(urows[:n])),
        valid=graph.valid.at[:n].set(True),
        slot_to_rowid=graph.slot_to_rowid.at[:n].set(jnp.asarray(rowids)),
        entry=jnp.int32(entry_slot),
        max_level=jnp.int32(int(levels.max())),
        count=jnp.int32(n),
    )
    xv_orig = xv if want_rerank else None
    del tape_vals
    quantized = config.storage_dtype != "f32"
    if quantized:
        # refine/backlinks/candidates score against what search will
        # see: the stored (quantized) values. The f32 form of them is
        # materialized LAZILY and per-phase — at 1M x 960 the corpus,
        # tape, f32 scoring slice, and IVF permuted tape cannot all
        # coexist in 16 GB of HBM (round-5 OOMs), so the IVF pass reads
        # the storage tape directly and only the scan/sample phases pay
        # for a dequantized slice.
        xv = None

    def _xv_scoring():
        if not quantized:
            return xv
        return jax.jit(lambda t: t[:n].astype(jnp.float32))(graph.vectors)

    C0 = candidates or max(2 * config.m0, config.m0 + 8)

    done_units = [0]
    # progress weighting: candidate pass ~ half the work
    total_units = 2 * n

    def knn_prog(done, total):
        if progress is not None:
            progress(min(done_units[0] + done // 2, total_units), total_units)

    # ---- base layer
    from vss_tpu.ops.scan import native_scan_supported
    from vss_tpu.utils import use_pallas

    scan_ok = use_pallas() and native_scan_supported(graph.vectors.dtype)
    mode = os.environ.get("VSS_CAND_MODE", candidate_mode)
    if mode == "auto":
        if n < _IVF_AUTO_MIN_N:
            mode = "exact"
        elif scan_ok:
            # hybrid: IVF first (fast on anything clustered), sampled
            # oracle check (~0.3 s), scan pass only when the lists fail
            # — flat data gets near-exact lists, clustered pays nothing
            mode = "hybrid"
        else:
            mode = "ivf"

    def _scan_pass():
        from vss_tpu.ops.scan import SCAN_K_MAX

        xvs = _xv_scoring()
        tape_n = graph.vectors[:n]
        tape_norms = jnp.sum(xvs * xvs, axis=1)
        return scan_candidates(
            xvs, tape_n, jnp.ones((n,), jnp.bool_), tape_norms,
            min(C0, SCAN_K_MAX), config.metric, progress=knn_prog,
        )

    if mode == "scan":
        cand_d, cand_i = _scan_pass()
    elif mode in ("ivf", "hybrid"):
        from vss_tpu.index.ivf_candidates import ivf_candidates

        # the STORAGE tape feeds IVF directly: only candidate ordering
        # survives this pass, and the int8 rows keep its permuted
        # scoring tape (and all transients) at 1/4 the f32 footprint
        cand_d, cand_i = ivf_candidates(
            graph.vectors[:n] if quantized else xv,
            slots, C0, config.metric, seed=seed + 1, progress=knn_prog,
        )
        # IVF lists are locality-dependent: on flat (iid-like) data the
        # probed pool misses the true neighbors and the graph collapses
        # (round-3: recall@10 = 0.095 at 1M iid). The repairs:
        # 'hybrid' replaces failing lists with the near-exact scan pass
        # (TPU); 'ivf' (off-TPU / forced) applies NN-descent rounds,
        # whose own sampled trigger skips clustered corpora.
        if mode == "hybrid":
            from vss_tpu.index.nn_descent import sampled_list_recall

            if quantized and scan_ok:
                # oracle over the storage tape via the chunked scan: the
                # f32 brute-force oracle pads a second corpus-size copy
                # and OOM'd the 1M x 960 build (round 5)
                rec, _, _ = sampled_list_recall(
                    graph.vectors[:n], cand_i, config.metric,
                    seed=seed + 2, use_scan=True,
                )
            else:
                rec, _, _ = sampled_list_recall(
                    _xv_scoring(), cand_i, config.metric, seed=seed + 2
                )
            _mark(f"ivf sampled recall@10={rec:.3f}")
            # bar at 0.60: clustered corpora sample ~0.8 (and those
            # lists already yield 0.92+ SEARCH recall — the round-2
            # flagship), while flat/iid corpora sample ~0.05-0.3; the
            # scan fallback costs ~105 s at 1M and must not fire on
            # data the fast path serves fine
            if rec < float(os.environ.get("VSS_CAND_RECALL_BAR", "0.60")):
                cand_d, cand_i = _scan_pass()
                _mark("scan fallback", cand_i)
        elif os.environ.get("VSS_NND", "1") == "1":
            from vss_tpu.index.nn_descent import nn_descent_refine

            cand_d, cand_i = nn_descent_refine(
                _xv_scoring(), cand_d, cand_i, config.metric,
                max_rounds=int(os.environ.get("VSS_NND_ROUNDS", "6")),
                seed=seed + 2,
            )
            _mark("nn-descent", cand_i)
    else:
        cand_d, cand_i = exact_knn(
            _xv_scoring(), slots, C0, config.metric, block=block, tile=tile,
            progress=knn_prog,
        )
    _mark(f"candidates ({mode})", cand_i)
    done_units[0] = n
    # the cap-row f32 scoring tape for refine/backlinks/uppers/repair;
    # deferred past the candidate pass for HBM headroom (see above).
    # Candidate-phase temporaries (and the closures pinning them) drop
    # first so the two never coexist.
    del _scan_pass, _xv_scoring
    if quantized:
        del xv
    tape_f32 = graph.vectors.astype(jnp.float32)
    refine_chunk = min(4096, round_up(n, 256))
    A_pad = round_up(n, refine_chunk)
    pad = A_pad - n
    sink = graph.capacity - 1
    cand_d_p = jnp.pad(cand_d, ((0, pad), (0, 0)), constant_values=_INF)
    cand_i_p = jnp.pad(cand_i, ((0, pad), (0, 0)), constant_values=-1)
    slots_p = jnp.pad(slots, (0, pad), constant_values=sink)
    adj0 = _refine_forward(
        graph.adj0, tape_f32, cand_d_p, cand_i_p, slots_p, config,
        config.m0, refine_chunk,
    )
    graph = dataclasses.replace(graph, adj0=adj0)
    _mark("refine", graph.adj0)
    forward0 = jnp.take(graph.adj0, slots, axis=0)
    graph = _backlink_pass(
        graph, config, slots, slots, forward0, tape_f32, 0, backlink_chunk
    )
    _mark("backlinks", graph.adj0)
    done_units[0] = int(1.5 * n)
    if progress is not None:
        progress(done_units[0], total_units)

    # ---- upper levels. All shapes are pow2-bucketed (pad members with
    # the sink slot) so every level — and every future build — reuses the
    # same compiled programs; unbucketed, each level recompiled the whole
    # knn/select/backlink pipeline (~24s of the 1M profile went to the
    # <4k-node levels alone).
    from vss_tpu.utils import next_pow2

    sink_slot = graph.capacity - 1
    for lev in range(1, int(levels.max()) + 1):
        member = np.where(levels >= lev)[0]
        if member.size <= 1:
            break
        A = member.size
        A_pad = next_pow2(max(A, 256))
        mem_pad = np.full(A_pad, sink_slot, np.int32)
        mem_pad[:A] = member
        rows_np = np.full(A_pad, -1, np.int32)
        rows_np[:A] = urows[member, lev - 1]
        from vss_tpu.utils import use_pallas

        upper_adj = _upper_level_pass(
            tape_f32,
            jnp.asarray(mem_pad),  # ascending: sink_slot > any member
            jnp.int32(A),
            jnp.asarray(rows_np),
            graph.upper_adj,
            config,
            C=2 * config.m,
            tile=min(tile, A_pad),
            block=min(block, A_pad),
            approx=use_pallas() and 2 * config.m <= A_pad // 8,
            dist_bf16=use_pallas(),
            chunk=min(backlink_chunk, 4096, A_pad),
        )
        graph = dataclasses.replace(graph, upper_adj=upper_adj)
        _mark(f"level {lev} ({A}->{A_pad})", graph.upper_adj)

    _mark("upper levels", graph.upper_adj)
    # ---- connectivity repair: a pure-kNN edge set can leave whole
    # clusters unreachable from the entry (see index/repair.py)
    from vss_tpu.index.repair import repair_connectivity

    graph, _ = repair_connectivity(graph, config)
    _mark("repair", graph.adj0)
    if progress is not None:
        progress(total_units, total_units)
    if want_rerank:
        rr = config.rerank_dtype
        rtape = None
        if rr is not None:
            # free the f32 scoring tape and candidate-phase arrays
            # BEFORE materializing the side tape — at 1M x 960 they
            # cannot coexist with the corpus in 16 GB of HBM; the
            # scale + cast + pad fuse into ONE program so only the
            # final tape materializes
            del tape_f32
            del cand_d, cand_i, cand_d_p, cand_i_p, forward0, slots_p
            cap_pad = graph.capacity - n

            @jax.jit
            def _mk_rtape(v):
                vals = (v / prescale if prescale != 1.0 else v).astype(rr)
                return jnp.pad(vals, ((0, cap_pad), (0, 0)))

            rtape = _mk_rtape(xv_orig)
            _mark("rerank tape", rtape)
        return graph, next_row, rtape
    return graph, next_row
