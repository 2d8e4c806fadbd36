"""Graph connectivity audit + repair.

A kNN-derived graph (and, less often, an incrementally built one) can
leave whole clusters unreachable from the entry point: every edge is
local, so a component with no inbound edge from the entry's component is
invisible to beam search no matter how large ef gets — recall saturates
below 1.0. The reference has no answer to this (usearch never checks
reachability; disconnected regions silently lose recall). Here it is a
first-class pass:

  1. `reachable_mask`: fixpoint propagation of reachability over the
     base-layer adjacency — a `lax.while_loop` of scatter-max steps, each
     one full [cap, M0] edge sweep (no frontier queues: the TPU prefers
     doing all edges every round to dynamic shapes).
  2. `repair_connectivity`: for every unreachable node, find its nearest
     REACHABLE node by (masked) brute force and splice a bidirectional
     bridge edge into the last adjacency slot of each endpoint. One round
     reaches every bridged node; intra-component kNN edges then spread
     reachability to its whole cluster, so a handful of rounds converges.
     Reachability here runs on device as gather sweeps over a capped
     REVERSE adjacency (`_sweep_reachable_rev`) — conservative (the cap
     can only under-report reach, erring toward harmless extra bridges)
     and transfer-free, unlike the earlier host-BFS design that moved
     the full adjacency across the relay twice (~106 s of the 1M build).

Used by the exact bulk builder (`index/exact_build.py`) and after
`compact()` at high delete fractions, where tombstone removal can sever
components.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vss_tpu.index.graph import HNSWConfig, HNSWGraph
from vss_tpu.ops.topk import bruteforce_topk
from vss_tpu.utils import round_up

__all__ = ["reachable_mask", "repair_connectivity"]


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def _reachable_impl(adj0, entry, occupied, max_sweeps: int):
    cap = adj0.shape[0]
    reached = jnp.zeros((cap,), jnp.bool_).at[jnp.maximum(entry, 0)].set(
        entry >= 0
    )

    def cond(state):
        i, reached, changed = state
        return (i < max_sweeps) & changed

    def body(state):
        i, reached, _ = state
        tgt = jnp.where(reached[:, None], adj0, -1)
        nxt = reached.at[jnp.maximum(tgt, 0).reshape(-1)].max(
            (tgt >= 0).reshape(-1)
        )
        return i + 1, nxt, jnp.any(nxt != reached)

    _, reached, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), reached, jnp.bool_(True))
    )
    return reached & occupied


def reachable_mask(graph: HNSWGraph, max_sweeps: int = 64) -> jax.Array:
    """bool [cap]: occupied slots reachable from the entry point via
    base-layer edges. Each sweep extends reachability by one hop, so
    `max_sweeps` bounds the detectable graph diameter."""
    occupied = graph.slot_to_rowid >= 0
    return _reachable_impl(graph.adj0, graph.entry, occupied, max_sweeps)


_MAX_ANCHORS = 65536
_REV_CAP = 32  # incoming edges kept per node for device reachability


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def _sweep_reachable_rev(rev, reached, occupied, max_sweeps: int):
    """Fixpoint reachability by GATHER sweeps over a capped reverse
    adjacency: node i becomes reached when any of its (recorded) incoming
    sources is reached. All-gather, no scatter — the formulation the TPU
    likes (a scatter-max sweep measured ~170 s at 1M; this runs in
    seconds). The cap makes reachability CONSERVATIVE (missing incoming
    edges can only under-report), which errs toward harmless extra
    bridges, never missed dark nodes."""

    def cond(st):
        i, r, ch = st
        return (i < max_sweeps) & ch

    def body(st):
        i, r, _ = st
        src_ok = jnp.take(r, jnp.maximum(rev, 0), axis=0) & (rev >= 0)
        nr = r | (src_ok.any(axis=1) & occupied)
        return i + 1, nr, jnp.any(nr != r)

    _, r, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), reached, jnp.bool_(True))
    )
    return r


def repair_connectivity(
    graph: HNSWGraph,
    config: HNSWConfig,
    max_rounds: int = 8,
    max_bridges_per_round: int = 16384,
    query_chunk: int = 4096,
) -> tuple[HNSWGraph, int]:
    """Bridge unreachable nodes into the entry component.

    Returns (graph, n_bridged). Everything heavy stays on device: a
    capped reverse adjacency is built once (one global edge sort,
    `exact_build._group_incoming`) and reachability runs as gather
    sweeps over it (`_sweep_reachable_rev`) — the previous host-BFS
    design downloaded and re-uploaded the full 128 MB adjacency through
    the relay and dominated the 1M build profile (~106 s). Each round:
    pick up to `max_bridges_per_round` unreachable nodes (an
    evenly-strided sample when there are more — one bridge per
    disconnected component suffices, because intra-component edges
    spread reachability to the rest), find each one's nearest REACHABLE
    ANCHOR and write a bidirectional bridge into the tail adjacency
    slots of both endpoints. The anchors are a strided sample (≤65536)
    of the reached set packed densely on device — scanning the full tape
    with a validity mask measured ~6x slower at 1M and bridges only need
    a *near* anchor, not the global nearest. Sweeps RESUME from the
    bridged nodes (set reached directly) instead of restarting.
    """
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
                f"[repair] {label}: {_time.perf_counter() - _t0:.1f}s",
                file=sys.stderr, flush=True,
            )

    from vss_tpu.index.exact_build import _group_incoming

    entry = int(np.asarray(graph.entry))
    if entry < 0:
        return graph, 0
    cap = graph.adj0.shape[0]
    adj = graph.adj0
    occupied_d = graph.slot_to_rowid >= 0
    # _group_incoming keeps the first _REV_CAP incoming per target in EDGE
    # ORDER — i.e. the lowest-slot sources, a systematic bias that lets a
    # single-entry reach stall (measured: 1,989/1M nodes after 64 sweeps).
    # Feeding the rows through a bijective stride permutation makes the
    # kept incoming a pseudo-random sample of each target's true sources,
    # so reach spreads like a random _REV_CAP-regular expander.
    import math

    stride = 2654435761 % cap
    while math.gcd(stride, cap) != 1:
        stride += 1
    perm = (np.arange(cap, dtype=np.int64) * stride % cap).astype(np.int32)
    perm_j = jnp.asarray(perm)
    rev = _group_incoming(
        perm_j, jnp.take(adj, perm_j, axis=0), cap, _REV_CAP
    )
    reached_d = jnp.zeros((cap,), jnp.bool_).at[entry].set(True)
    reached_d = _sweep_reachable_rev(rev, reached_d, occupied_d, 64)
    _mark("reverse adjacency + initial sweeps", reached_d)
    occupied = np.asarray(occupied_d)
    total = 0
    # gathers cast AFTER the (small) take: a full dequantized f32 tape
    # here was 3.87 GB on top of the builder's own scoring tape and
    # OOM'd the 1M x 960 build (round 5); numerics are identical
    tape = graph.vectors
    last = config.m0 - 1
    spread = min(4, config.m0)
    for _ in range(max_rounds):
        reached = np.asarray(reached_d) & occupied
        idx = np.nonzero(occupied & ~reached)[0]
        if idx.size == 0 or not reached.any():
            break
        if idx.size > max_bridges_per_round:
            stride = idx.size / max_bridges_per_round
            idx = idx[(np.arange(max_bridges_per_round) * stride).astype(np.int64)]
        # pad to a fixed-size bucket so rounds reuse compilations
        bucket = round_up(idx.size, min(query_chunk, 256))
        up = np.full(bucket, int(idx[0]), np.int32)
        up[: idx.size] = idx
        # densely packed anchor sample of the reached set, pow2-padded
        # (pad entries repeat anchor 0 — harmless duplicates)
        ridx = np.nonzero(reached)[0]
        if ridx.size > _MAX_ANCHORS:
            astride = ridx.size / _MAX_ANCHORS
            ridx = ridx[(np.arange(_MAX_ANCHORS) * astride).astype(np.int64)]
        a_pad = 1 << max(int(ridx.size - 1).bit_length(), 8)
        anchors = np.zeros(a_pad, np.int32)
        anchors[: ridx.size] = ridx
        anchors[ridx.size:] = ridx[0]
        anchors_j = jnp.asarray(anchors)
        anchor_vecs = jnp.take(tape, anchors_j, axis=0).astype(jnp.float32)
        near_parts = []
        for s in range(0, bucket, query_chunk):
            u_vecs = jnp.take(
                tape, jnp.asarray(up[s : s + query_chunk]), axis=0
            ).astype(jnp.float32)
            # 'default' precision: a bridge only needs a NEAR anchor;
            # bf16 near-tie reorderings are immaterial here and the
            # HIGHEST-precision scan was ~12s of the 1M build profile
            _, near_c = bruteforce_topk(
                u_vecs, anchor_vecs, 1, config.metric, precision="default"
            )
            near_parts.append(np.asarray(near_c[:, 0]))
        local = np.concatenate(near_parts)[: idx.size]
        r = anchors[np.maximum(local, 0)]
        r = np.where(local >= 0, r, -1)
        u = up[: idx.size]
        live = r >= 0
        u, r = u[live], r[live]
        _mark(f"round scans ({idx.size} dark, {ridx.size} anchors)")  # local is host-side already
        if u.size == 0:
            break
        uj = jnp.asarray(u.astype(np.int32))
        rj = jnp.asarray(r.astype(np.int32))
        adj = adj.at[uj, last].set(rj)
        # spread reverse bridges over the last few slots: many dark nodes
        # often share one nearest anchor, and distinct columns let
        # several of their bridges survive instead of one
        adj = adj.at[rj, last - (uj % spread)].set(uj)
        # the reverse bridge r -> u makes every u reachable: mark them
        # directly and resume sweeps so their components light up
        reached_d = _sweep_reachable_rev(
            rev, reached_d.at[uj].set(True), occupied_d, 64
        )
        total += int(u.size)
        _mark(f"round sweeps (total bridged {total})", reached_d)
    if total:
        graph = dataclasses.replace(graph, adj0=adj)
    return graph, total
