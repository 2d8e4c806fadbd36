"""Batched HNSW search: greedy upper-level descent + base-layer beam search.

TPU-native replacement for the reference's per-query traversal
(`/root/reference/src/include/usearch/index.hpp`: `search_for_one_`
:3809-3847 greedy descent, `search_to_find_in_base_` :3929-3999 beam).
Differences forced by (and exploited on) the hardware:

  * Batch-first: a whole [B] batch of queries traverses in lockstep inside
    one `lax.while_loop`; per-query early exit becomes a `done` mask.
  * No visited bitset: instead of a per-query hash set, novelty is tested
    by membership against (candidate pool ∪ expansion history ∪ result
    pool) — bounded arrays, no scatter. A node evicted from all three can
    be re-scored, which costs a little wasted work, never correctness.
  * Two pools, like the reference's next_candidates/top_candidates split:
    the candidate pool drives traversal and ignores tombstones (deleted
    nodes still route, matching `index_dense.hpp:1816-1828` semantics);
    the result pool only admits `valid & filter` nodes.

All loops are fixed-bound with masking; everything jits once per
(capacity-bucket, batch, k, ef) combination.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vss_tpu.index.graph import HNSWConfig, HNSWGraph
from vss_tpu.ops.distance import Metric, gathered_distances

__all__ = ["hnsw_search", "greedy_descent", "pivot_seeds"]

_INF = float("inf")  # python scalar: no backend init at import


def _gather_vectors(vectors: jax.Array, ids: jax.Array) -> jax.Array:
    """vectors[ids] with -1-safe clamping. Caller masks distances."""
    return jnp.take(vectors, jnp.maximum(ids, 0), axis=0)


def _default_fused(graph: HNSWGraph) -> bool:
    """Use the fused Pallas gather+score kernel when it applies: TPU
    backend; f32 tapes DMA rows directly, bf16/int8 tapes ride the
    i32-word packed view (`ops/gather.pack_table` — Mosaic rejects 1-row
    HBM slices of sub-word dtypes, so sub-word rows are reinterpreted as
    word rows and decoded in VMEM). VSS_FUSED_GATHER=0/1 overrides."""
    import os

    from vss_tpu.utils import use_pallas

    env = os.environ.get("VSS_FUSED_GATHER")
    d = graph.vectors.shape[1]
    # packed sub-word rows must span >= 128 i32 lanes per DMA (Mosaic
    # alignment, see ops/gather.pack_table)
    packable = (
        (graph.vectors.dtype == jnp.float32 and d % 128 == 0)
        or (graph.vectors.dtype == jnp.bfloat16 and d % 256 == 0)
        or (graph.vectors.dtype == jnp.int8 and d % 512 == 0)
    )
    if env is not None:
        return env == "1" and packable
    # default: f32 only for now — the packed sub-word kernel is opt-in
    # (VSS_FUSED_GATHER=1) until A/B'd against the XLA gather on chip
    return use_pallas() and graph.vectors.dtype == jnp.float32 and packable


def _gathered_norms(x_norms, ids):
    if x_norms is None:
        return None
    return jnp.take(x_norms, jnp.maximum(ids, 0), axis=0)


def _descent_step(graph: HNSWGraph, config: HNSWConfig, q, state, x_norms, q_norms):
    """One step of batched greedy descent over upper levels."""
    lvl, cur, cur_d = state
    # upper_row column for level `lvl` is lvl-1; only meaningful when lvl>=1.
    col = jnp.maximum(lvl - 1, 0)
    row = jnp.take_along_axis(
        jnp.take(graph.upper_row, cur, axis=0), col[:, None], axis=1
    )[:, 0]
    active = (lvl > 0) & (row >= 0)
    neigh = jnp.take(graph.upper_adj, jnp.maximum(row, 0), axis=0)  # [B, M]
    neigh = jnp.where(active[:, None], neigh, -1)
    nd = gathered_distances(
        q, _gather_vectors(graph.vectors, neigh), config.metric,
        _gathered_norms(x_norms, neigh), q_norms,
    )
    nd = jnp.where(neigh >= 0, nd, _INF)
    j = jnp.argmin(nd, axis=1)
    best_d = jnp.take_along_axis(nd, j[:, None], axis=1)[:, 0]
    best_i = jnp.take_along_axis(neigh, j[:, None], axis=1)[:, 0]
    improved = active & (best_d < cur_d)
    cur = jnp.where(improved, best_i, cur)
    cur_d = jnp.where(improved, best_d, cur_d)
    # no improvement (or no row at this level) -> drop a level
    lvl = jnp.where(improved, lvl, jnp.maximum(lvl - 1, 0))
    return lvl, cur, cur_d


def greedy_descent(
    graph: HNSWGraph,
    config: HNSWConfig,
    q: jax.Array,
    stop_level: jax.Array | int = 0,
    max_iters: int = 0,
    x_norms: Optional[jax.Array] = None,
    q_norms: Optional[jax.Array] = None,
):
    """Descend from the entry point to `stop_level` (per-query or scalar).

    Returns (cur [B] i32, cur_d [B] f32): the best node found at
    `stop_level + 1`'s granularity — i.e. the beam-search seed.
    """
    B = q.shape[0]
    entry = jnp.maximum(graph.entry, 0)
    cur = jnp.full((B,), entry, jnp.int32)
    cur_d = gathered_distances(
        q, _gather_vectors(graph.vectors, cur[:, None]), config.metric,
        _gathered_norms(x_norms, cur[:, None]), q_norms,
    )[:, 0]
    start = jnp.maximum(graph.max_level, 0)
    stop = jnp.broadcast_to(jnp.asarray(stop_level, jnp.int32), (B,))
    lvl = jnp.maximum(jnp.full((B,), start, jnp.int32), stop)
    if max_iters <= 0:
        # level drops only on non-improving steps; improving steps are
        # bounded by path length. 8*levels + 32 is generous.
        max_iters = 8 * config.max_levels + 32

    def cond(state):
        i, (lvl, cur, cur_d) = state
        return (i < max_iters) & jnp.any(lvl > stop)

    def body(state):
        i, (lvl, cur, cur_d) = state
        nlvl, ncur, ncur_d = _descent_step(
            graph, config, q, (lvl, cur, cur_d), x_norms, q_norms
        )
        # freeze queries that already reached their stop level
        frozen = lvl <= stop
        lvl = jnp.where(frozen, lvl, nlvl)
        cur = jnp.where(frozen, cur, ncur)
        cur_d = jnp.where(frozen, cur_d, ncur_d)
        return i + 1, (lvl, cur, cur_d)

    _, (lvl, cur, cur_d) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), (lvl, cur, cur_d))
    )
    return cur, cur_d


def _merge_sorted(a_ops, b_ops, num_out: int):
    """Merge two per-row-sorted-ascending operand tuples into the first
    `num_out` columns of their sorted union, via one bitonic-merge
    network — ~2x cheaper than re-sorting the concatenation, which is
    what a beam iteration otherwise pays to fold new candidates into its
    (already sorted) pool. a_ops/b_ops: tuples of [B, na]/[B, nb] arrays
    whose first element is the f32 sort key. Ties resolve by network
    position (not stable)."""
    a_d = a_ops[0]
    b_d = b_ops[0]
    B, na = a_d.shape
    nb = b_d.shape[1]
    n = na + nb
    pow2 = 1 << (n - 1).bit_length()
    pad = pow2 - n
    ops = []
    for a, b in zip(a_ops, b_ops):
        fill = _INF if a.dtype == jnp.float32 else -1
        parts = [a, b[:, ::-1]]
        if pad:
            # pad inside the REVERSED b half: a ++ reverse(b ++ inf_pad)
            parts = [a, jnp.full((B, pad), fill, a.dtype), b[:, ::-1]]
        ops.append(jnp.concatenate(parts, axis=1))
    step = pow2 // 2
    while step >= 1:
        halves = [o.reshape(B, -1, 2, step) for o in ops]
        lo_d, hi_d = halves[0][:, :, 0], halves[0][:, :, 1]
        swap = lo_d > hi_d
        out = []
        for h in halves:
            lo, hi = h[:, :, 0], h[:, :, 1]
            nlo = jnp.where(swap, hi, lo)
            nhi = jnp.where(swap, lo, hi)
            out.append(
                jnp.stack([nlo, nhi], axis=2).reshape(B, -1)
            )
        ops = out
        step //= 2
    return tuple(o[:, :num_out] for o in ops)


def _dedupe_across_groups(neigh: jax.Array, E: int, m0: int) -> jax.Array:
    """neigh [B, E*m0], the concatenation of E selected nodes' neighbor
    lists: mark ids already present in an earlier group as -1. For the
    small E used in search this is E*(E-1)/2 block compares — far cheaper
    than the sort+argsort dedupe (`_dedupe_keep_first`)."""
    if E == 1:
        return neigh
    B = neigh.shape[0]
    g = neigh.reshape(B, E, m0)
    cols = [g[:, 0]]
    for j in range(1, E):
        prior = g[:, :j].reshape(B, j * m0)
        cur = g[:, j]
        dup = (cur[:, :, None] == prior[:, None, :]).any(axis=2)
        cols.append(jnp.where(dup, -1, cur))
    return jnp.concatenate(cols, axis=1)


def _dedupe_keep_first(ids: jax.Array) -> jax.Array:
    """Per-row: replace duplicate ids (keeping first occurrence) with -1."""
    B, C = ids.shape
    pos = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, C), 1), (B, C)
    )
    sorted_ids, sorted_pos = jax.lax.sort_key_val(ids, pos, dimension=1)
    dup_sorted = jnp.concatenate(
        [
            jnp.zeros((B, 1), jnp.bool_),
            sorted_ids[:, 1:] == sorted_ids[:, :-1],
        ],
        axis=1,
    )
    # route dup flags back to original positions
    inv = jnp.argsort(sorted_pos, axis=1)
    dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
    return jnp.where(dup, -1, ids)


def beam_search_base(
    graph: HNSWGraph,
    config: HNSWConfig,
    q: jax.Array,
    seeds: jax.Array,
    seed_d: jax.Array,
    ef: int,
    allow: jax.Array,
    expand: int = 1,
    max_iters: int = 0,
    level: int = 0,
    x_norms: Optional[jax.Array] = None,
    q_norms: Optional[jax.Array] = None,
    dual_pool: bool = True,
    use_history: bool = True,
    fused: bool = False,
    packed_tape: Optional[jax.Array] = None,
    packing: int = 1,
):
    """Beam search with pool size `ef` from per-query seed nodes.

    allow: bool [cap] — nodes admissible to the RESULT pool (valid & not
    tombstoned & user predicate). Traversal ignores it.

    When `level != 0` the beam runs over that upper level's adjacency
    (used by construction to collect per-level candidates). `level` may be
    a traced scalar (>= 1) so construction can loop over levels with
    `lax.fori_loop` instead of unrolling — keeps the compiled program
    small.

    Returns (res_d [B, ef] ascending, res_i [B, ef], cand_i [B, ef]):
    result pool and the raw (unfiltered) candidate pool.

    dual_pool=False merges the two pools into one — valid only when every
    reachable node is admissible (no tombstones, no filter); the hot
    common case, one fewer sort per iteration.

    use_history=False drops the expansion-history array: novelty is then
    tested against the pools only, so a node evicted from the pool can be
    re-scored and (rarely) re-expanded — bounded wasted work, fewer ops
    per iteration.
    """
    B = q.shape[0]
    base = isinstance(level, int) and level == 0
    m0 = config.m0 if base else config.m
    E = expand
    if max_iters <= 0:
        max_iters = 4 + (2 * ef) // E
    hist_len = max_iters * E if use_history else 1

    # seeds may be [B] (single seed, the descent path) or [B, S]
    # (multi-seed, the pivot path) — both fill the head of the pool
    if seeds.ndim == 1:
        seeds = seeds[:, None]
        seed_d = seed_d[:, None]
    S = seeds.shape[1]
    cand_d = jnp.full((B, ef), _INF).at[:, :S].set(seed_d)
    cand_i = jnp.full((B, ef), -1, jnp.int32).at[:, :S].set(seeds)
    expanded = jnp.zeros((B, ef), jnp.bool_)
    seed_ok = (jnp.take(allow, jnp.maximum(seeds, 0)) & (seeds >= 0))
    res_d = jnp.full((B, ef), _INF).at[:, :S].set(
        jnp.where(seed_ok, seed_d, _INF)
    )
    res_i = (
        jnp.full((B, ef), -1, jnp.int32)
        .at[:, :S]
        .set(jnp.where(seed_ok, seeds, -1))
    )
    if S > 1:
        # pools are kept sorted ascending (the per-iteration merge relies
        # on it); multi-seed heads arrive in approx order — sort once
        cand_d, cand_i = jax.lax.sort(
            (cand_d, cand_i), dimension=1, num_keys=1, is_stable=True
        )
        res_d, res_i = jax.lax.sort(
            (res_d, res_i), dimension=1, num_keys=1, is_stable=True
        )
    hist = jnp.full((B, hist_len), -1, jnp.int32)

    def neighbors_of(ids):  # ids [B, E] -> [B, E*m0]
        if base:
            adj = jnp.take(graph.adj0, jnp.maximum(ids, 0), axis=0)
        else:
            rows_all = jnp.take(
                graph.upper_row, jnp.maximum(ids, 0), axis=0
            )  # [B, E, Lmax]
            col = jnp.asarray(level, jnp.int32) - 1
            row = jnp.take_along_axis(
                rows_all,
                jnp.broadcast_to(col, ids.shape)[..., None],
                axis=2,
            )[..., 0]
            adj = jnp.take(graph.upper_adj, jnp.maximum(row, 0), axis=0)
            adj = jnp.where((row >= 0)[:, :, None], adj, -1)
        adj = jnp.where((ids >= 0)[:, :, None], adj, -1)
        return adj.reshape(B, E * m0)

    def done_mask(cand_d, expanded, res_d):
        unexp = jnp.where(expanded, _INF, cand_d)
        unexp_min = jnp.min(unexp, axis=1)
        worst_res = res_d[:, ef - 1] if dual_pool else cand_d[:, ef - 1]
        return (unexp_min > worst_res) | ~jnp.isfinite(unexp_min)

    pool_pos = jax.lax.broadcasted_iota(jnp.int32, (B, ef), 1)

    def cond(state):
        it, evals, done, *_ = state
        return (it < max_iters) & ~jnp.all(done)

    def body(state):
        it, evals, done, cand_d, cand_i, expanded, res_d, res_i, hist = state
        # pick E best unexpanded candidates per query: E passes of
        # (argmin + mask) — cheaper than a width-ef sort for small E
        key = jnp.where(expanded | done[:, None], _INF, cand_d)
        sel_ids_list = []
        for _ in range(E):
            p = jnp.argmin(key, axis=1)
            v = jnp.take_along_axis(key, p[:, None], axis=1)[:, 0]
            hit = jnp.isfinite(v)
            sel_ids_list.append(
                jnp.where(hit, jnp.take_along_axis(cand_i, p[:, None], axis=1)[:, 0], -1)
            )
            one_hot = pool_pos == p[:, None]
            expanded = expanded | (one_hot & hit[:, None])
            key = jnp.where(one_hot, _INF, key)
        sel_ids = jnp.stack(sel_ids_list, axis=1)  # [B, E]
        if use_history:
            hist = jax.lax.dynamic_update_slice(hist, sel_ids, (0, it * E))

        neigh = neighbors_of(sel_ids)  # [B, E*m0]
        known_parts = [cand_i]
        if use_history:
            known_parts.append(hist)
        if dual_pool:
            known_parts.append(res_i)
        known = jnp.concatenate(known_parts, axis=1)
        dup = (neigh[:, :, None] == known[:, None, :]).any(axis=2)
        neigh = jnp.where(dup | (neigh < 0), -1, neigh)
        if E > 1:
            # cross-group block compares beat sort-based dedupe at small E
            neigh = _dedupe_across_groups(neigh, E, m0)
        # NOTE: a 4-row "group-fetch" DMA variant (one descriptor per 4
        # transpose-packed candidates, attacking the descriptor-issue
        # ceiling) was built in round 3 and fixed in round 4 to admit
        # only requested candidates — it STILL lost 3.4x to plain take
        # at equal eval counts (10.1k vs 34.1k qps at ef=32, BENCH_r04),
        # so the path was deleted; finding recorded in docs/BENCH.md.
        if fused:
            # fused Pallas gather+score: sentinel ids (dups, padding,
            # finished queries) issue no DMA and cost nothing
            from vss_tpu.ops.gather import gather_distances_pallas

            tab = packed_tape if packed_tape is not None else graph.vectors
            nd = gather_distances_pallas(
                tab, neigh, q, config.metric, q_norms,
                packing=packing if packed_tape is not None else 1,
            )
        else:
            nd = gathered_distances(
                q, _gather_vectors(graph.vectors, neigh), config.metric,
                _gathered_norms(x_norms, neigh), q_norms,
            )
            nd = jnp.where(neigh >= 0, nd, _INF)
        evals = evals + jnp.sum((neigh >= 0).astype(jnp.int32))

        # fold new candidates into the (sorted) pool: one narrow sort of
        # the new batch + a bitonic merge — ~2x cheaper than re-sorting
        # the full concatenation each iteration
        nd_s, ni_s = jax.lax.sort(
            (nd, neigh), dimension=1, num_keys=1, is_stable=True
        )
        new_cand_d, new_cand_i, new_cand_e = _merge_sorted(
            (cand_d, cand_i, expanded.astype(jnp.int32)),
            (nd_s, ni_s, jnp.zeros_like(ni_s)),
            ef,
        )
        new_expanded = new_cand_e.astype(jnp.bool_)

        # merge admissible nodes into result pool (dual-pool mode only —
        # in single-pool mode the candidate pool IS the result pool)
        if dual_pool:
            ok = (neigh >= 0) & jnp.take(allow, jnp.maximum(neigh, 0))
            rd = jnp.where(ok, nd, _INF)
            rd_s, ri_s = jax.lax.sort(
                (rd, neigh), dimension=1, num_keys=1, is_stable=True
            )
            new_res_d, new_res_i = _merge_sorted(
                (res_d, res_i), (rd_s, ri_s), ef
            )
            new_res_i = jnp.where(jnp.isfinite(new_res_d), new_res_i, -1)
        else:
            new_res_d, new_res_i = res_d, res_i

        # frozen queries keep their state
        keep = done[:, None]
        cand_d = jnp.where(keep, cand_d, new_cand_d)
        cand_i = jnp.where(keep, cand_i, new_cand_i)
        expanded = jnp.where(keep, expanded, new_expanded)
        res_d = jnp.where(keep, res_d, new_res_d)
        res_i = jnp.where(keep, res_i, new_res_i)
        done = done | done_mask(cand_d, expanded, res_d)
        return it + 1, evals, done, cand_d, cand_i, expanded, res_d, res_i, hist

    done0 = done_mask(cand_d, expanded, res_d)
    state = (
        jnp.int32(0), jnp.int32(0), done0, cand_d, cand_i, expanded,
        res_d, res_i, hist,
    )
    (
        it, evals, _done, cand_d, cand_i, expanded, res_d, res_i, hist
    ) = jax.lax.while_loop(cond, body, state)
    if not dual_pool:
        res_d, res_i = cand_d, cand_i
    # (iterations, batch-total distance evaluations) — the analog of
    # usearch's per-context measure counters (index.hpp:2213-2240), which
    # the reference collects and then discards; we surface them.
    return res_d, res_i, cand_i, (it, evals)


def pivot_seeds(
    graph: HNSWGraph,
    config: HNSWConfig,
    q: jax.Array,
    pivot_slots: jax.Array,  # [P] i32
    pivot_vecs: jax.Array,  # [P, d] densely packed pivot vectors
    n_seeds: int,
    q_norms: Optional[jax.Array] = None,
):
    """Seed the beam by exact scan over a pivot sample — the TPU-native
    replacement for the reference's greedy upper-level descent
    (`search_for_one_`, `index.hpp:3809-3847`). One [B, P] MXU tile
    against the (geometric, ~n/M) pivot sample ranks every coarse region
    at once; the top `n_seeds` pivots per query seed the base beam. No
    sequential hops, no upper-level gathers, and multi-seeding makes
    search robust to local-only edge sets (see index/exact_build.py)."""
    from vss_tpu.ops.distance import _epilogue

    pv = pivot_vecs.astype(jnp.float32)
    dots = jax.lax.dot_general(
        q, pv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qn = (
        jnp.sum(q * q, axis=-1, keepdims=True)
        if q_norms is None else q_norms[:, None]
    )
    pn = jnp.sum(pv * pv, axis=-1, keepdims=True).T
    d_qp = _epilogue(dots, qn, pn, Metric.parse(config.metric))
    d_qp = jnp.where((pivot_slots >= 0)[None, :], d_qp, _INF)
    n_seeds = min(n_seeds, pivot_slots.shape[0])
    from vss_tpu.utils import use_pallas

    if use_pallas() and pivot_slots.shape[0] >= 8 * n_seeds:
        sd, sp = jax.lax.approx_min_k(d_qp, n_seeds)
    else:
        neg, sp = jax.lax.top_k(-d_qp, n_seeds)
        sd = -neg
    seeds = jnp.where(
        jnp.isfinite(sd), jnp.take(pivot_slots, sp), -1
    )
    return seeds, sd


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "k", "ef", "expand", "max_iters", "dual_pool",
        "use_history", "fused", "n_seeds", "packing",
    ),
)
def _hnsw_search_impl(
    graph, config, q, allow, k, ef, expand, max_iters, dual_pool=True,
    use_history=True, fused=False, pivot_slots=None, pivot_vecs=None,
    n_seeds=4, x_norms=None, packed_tape=None, packing=1, rerank_tape=None,
):
    metric = Metric.parse(config.metric)
    q_norms = None
    if metric in (Metric.L2SQ, Metric.COSINE):
        q_norms = jnp.sum(q * q, axis=-1)
        if x_norms is None and not fused:
            # one pass over the tape, reused by every beam iteration (the
            # fused kernel computes row norms in VMEM instead)
            xv = graph.vectors.astype(jnp.float32)
            x_norms = jnp.sum(xv * xv, axis=-1)
    if pivot_slots is not None:
        seeds, _ = pivot_seeds(
            graph, config, q, pivot_slots, pivot_vecs, n_seeds, q_norms
        )
        # re-score seeds at full precision so pool/result distances are
        # consistent with the beam's own evaluations
        seed_d = gathered_distances(
            q, _gather_vectors(graph.vectors, seeds), config.metric,
            _gathered_norms(x_norms, seeds), q_norms,
        )
        seed_d = jnp.where(seeds >= 0, seed_d, _INF)
    else:
        seeds, seed_d = greedy_descent(
            graph, config, q, x_norms=x_norms, q_norms=q_norms
        )
    res_d, res_i, _, (iters, evals) = beam_search_base(
        graph, config, q, seeds, seed_d, ef, allow, expand, max_iters,
        x_norms=x_norms, q_norms=q_norms, dual_pool=dual_pool,
        use_history=use_history, fused=fused, packed_tape=packed_tape,
        packing=packing,
    )
    if rerank_tape is not None:
        # exact rescoring of the ef-wide pool against the full-precision
        # side tape: the pool's quantized-tape ordering errors are local,
        # so re-sorting the pool by exact distance recovers most of the
        # quantization recall loss for ~ef extra row gathers per query
        rv = jnp.take(rerank_tape, jnp.maximum(res_i, 0), axis=0)
        if Metric.parse(config.metric) == Metric.L2SQ:
            # direct difference form: the dot-product trick loses ~3
            # digits to cancellation at byte magnitudes (||x||^2 ~ 1e6 vs
            # distances ~ 1e1); this stage is tiny, so spend the FLOPs
            diff = q[:, None, :] - rv.astype(jnp.float32)
            rd = jnp.sum(diff * diff, axis=-1)
        else:
            rd = gathered_distances(q, rv, config.metric, None, q_norms)
        rd = jnp.where(res_i >= 0, rd, _INF)
        res_d, res_i = jax.lax.sort(
            (rd, res_i), dimension=1, num_keys=1, is_stable=True
        )
    out_d = res_d[:, :k]
    out_i = res_i[:, :k]
    # empty graph -> nothing
    empty = graph.entry < 0
    out_d = jnp.where(empty, _INF, out_d)
    out_i = jnp.where(empty, -1, out_i)
    return out_d, out_i, iters, evals


def hnsw_search(
    graph: HNSWGraph,
    config: HNSWConfig,
    q: jax.Array,
    k: int,
    ef: Optional[int] = None,
    filter_mask: Optional[jax.Array] = None,
    expand: int = 1,
    max_iters: int = 0,
    with_stats: bool = False,
    assume_all_valid: bool = False,
    use_history: bool = True,
    fused: Optional[bool] = None,
    pivot_slots: Optional[jax.Array] = None,
    pivot_vecs: Optional[jax.Array] = None,
    n_seeds: int = 4,
    x_norms: Optional[jax.Array] = None,
    packed_tape: Optional[jax.Array] = None,
    packing: int = 1,
    rerank_tape: Optional[jax.Array] = None,
):
    """k-NN search over the graph for a batch of queries.

    q: [B, d]. Returns (dists [B, k] ascending f32, slots [B, k] i32, -1
    past the end). `ef` defaults to max(config.ef_search, k), matching the
    reference's per-scan override logic (`hnsw_index.cpp:318-329`).
    `filter_mask` is an optional bool [cap] row predicate (the analog of
    usearch's `filtered_search`); tombstoned slots are always excluded from
    results but still routable.

    `pivot_slots`/`pivot_vecs` switch seeding from greedy descent to the
    pivot-scan path (`pivot_seeds`), with `n_seeds` beam seeds per query.
    `x_norms` optionally passes the precomputed squared-norm tape (saves
    one full-tape reduction per call; see HNSWIndex.search).

    with_stats=True additionally returns {"iterations", "distance_evals"}
    for the batch — the counters the reference computes per thread context
    and then discards (SURVEY §5.1); we surface them.
    """
    if ef is None:
        ef = config.ef_search
    ef = max(ef, k)
    n_seeds = min(n_seeds, ef)
    allow = graph.valid
    if filter_mask is not None:
        allow = allow & filter_mask
    # single-pool fast path: every reachable node admissible (caller
    # guarantees no tombstones via assume_all_valid; no filter given)
    dual_pool = not (assume_all_valid and filter_mask is None)
    if fused is None:
        fused = _default_fused(graph)
    if fused and graph.vectors.dtype != jnp.float32 and packed_tape is None:
        # sub-word tapes need the packed i32 view; without one (no cache
        # provided by the caller) fall back to the XLA gather path
        fused = False
    d, i, iters, evals = _hnsw_search_impl(
        graph, config, q.astype(jnp.float32), allow, k, ef, expand,
        max_iters, dual_pool, use_history, fused, pivot_slots,
        pivot_vecs, n_seeds, x_norms, packed_tape, packing, rerank_tape,
    )
    if with_stats:
        return d, i, {"iterations": int(iters), "distance_evals": int(evals)}
    return d, i
