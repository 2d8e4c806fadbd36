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


def repair_connectivity(
    graph: HNSWGraph,
    config: HNSWConfig,
    max_rounds: int = 8,
    max_sweeps: int = 64,
    max_bridges_per_round: int = 16384,
    query_chunk: int = 4096,
) -> tuple[HNSWGraph, int]:
    """Bridge unreachable nodes into the entry component.

    Returns (graph, n_bridged). Each round: recompute reachability, pick
    up to `max_bridges_per_round` unreachable nodes (an evenly-strided
    sample when there are more — one bridge per disconnected component
    suffices, because intra-component edges spread reachability to the
    rest on the next sweep), find each one's nearest reachable node by
    masked exact scan (query-chunked), and write a bidirectional bridge
    into slot M0-1 of both adjacency rows. Reverse bridges into one
    popular target overwrite each other (last write wins) — the
    survivors anchor their components and the next round bridges
    whatever is still dark.
    """
    total = 0
    tape = graph.vectors
    for _ in range(max_rounds):
        reached = reachable_mask(graph, max_sweeps)
        occupied = graph.slot_to_rowid >= 0
        dark = np.asarray(occupied & ~reached)
        idx = np.nonzero(dark)[0]
        if idx.size == 0:
            break
        if not bool(np.asarray(jnp.any(reached))):
            break  # empty graph / no entry
        if idx.size > max_bridges_per_round:
            stride = idx.size / max_bridges_per_round
            idx = idx[(np.arange(max_bridges_per_round) * stride).astype(np.int64)]
        # pad to a fixed-size bucket so rounds reuse compilations
        bucket = round_up(idx.size, min(query_chunk, 256))
        up = np.full(bucket, int(idx[0]), np.int32)
        up[: idx.size] = idx
        u_slots = jnp.asarray(up)
        tape_f32 = tape.astype(jnp.float32)
        near_parts = []
        for s in range(0, bucket, query_chunk):
            chunk_slots = u_slots[s : s + query_chunk]
            u_vecs = jnp.take(tape_f32, chunk_slots, axis=0)
            _, near_c = bruteforce_topk(
                u_vecs, tape_f32, 1, config.metric, valid_mask=reached
            )
            near_parts.append(near_c[:, 0])
        r_slots = jnp.concatenate(near_parts) if len(near_parts) > 1 else near_parts[0]
        live = (jnp.arange(bucket) < idx.size) & (r_slots >= 0)
        sink = graph.capacity - 1
        u_w = jnp.where(live, u_slots, sink)
        r_w = jnp.where(live, r_slots, sink)
        last = config.m0 - 1
        adj0 = graph.adj0.at[u_w, last].set(jnp.where(live, r_slots, -1))
        # spread reverse bridges over the last few slots: many dark nodes
        # often share one nearest anchor, and distinct columns let up to
        # 4 of their bridges survive the scatter instead of 1
        r_col = last - (u_slots % jnp.int32(min(4, config.m0)))
        adj0 = adj0.at[r_w, r_col].set(jnp.where(live, u_slots, -1))
        graph = dataclasses.replace(graph, adj0=adj0)
        total += int(idx.size)
    return graph, total
