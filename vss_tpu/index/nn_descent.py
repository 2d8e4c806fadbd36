"""NN-descent refinement of bulk candidate lists (MXU/gather-shaped).

The IVF-window candidate pass (`index/ivf_candidates.py`) depends on
locality: each point only scores against its `probes` nearest buckets.
On clustered corpora that pool contains the true neighbors; on flat
(i.i.d.-like) distributions it is near-random and the graph built from
it collapses (round-3 finding: recall@10 = 0.095 at 1M x 128 iid).

The distribution-agnostic cure — the same convergence argument as the
reference's insert-side beam search, which explores the *current graph*
rather than a spatial partition
(`/root/reference/src/include/usearch/index.hpp:3855-3922`) — is
NN-descent (Dong et al., WWW'11): "a neighbor of a neighbor is likely a
neighbor". Re-shaped for the TPU it is purely batched gathers + batched
mat-vecs, no per-node control flow:

  one round, for every node u with current candidate list B[u] (top-S):
    R[u] = reverse edges  (who lists u — one global sort of n*S edges)
    U[u] = B[u] ∪ R[u]
    pool = U[u] ∪ B[U[u]]              (neighbors of neighbors, both
                                         directions — the local-join
                                         signal that drives convergence)
    score d(u, pool) on gathered vectors, merge into the running top-C.

Rounds are ADAPTIVE: a 1k-node sampled oracle measures the candidate
lists' recall@10 each round, so clustered corpora (whose IVF lists are
already ~0.95+) pay zero rounds and flat corpora iterate until the lists
converge or `max_rounds` is hit. The merged lists keep the
`exact_knn`/`ivf_candidates` contract: dists [n, C] ascending f32,
ids [n, C] i32, -1 padded, self excluded.
"""
from __future__ import annotations

import functools
import os
import sys
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vss_tpu.ops.distance import Metric
from vss_tpu.utils import round_up

__all__ = ["nn_descent_refine", "sampled_list_recall"]

_INF = float("inf")


@functools.partial(jax.jit, static_argnames=("S",))
def _reverse_union(cand_i, S: int):
    """B = top-S of each list, R = up-to-S reverse edges; returns
    (B [n, S], U = B ∪ R [n, 2S]). One global sort of n*S edges."""
    from vss_tpu.index.exact_build import _group_incoming

    n = cand_i.shape[0]
    B = cand_i[:, :S]
    slots = jnp.arange(n, dtype=jnp.int32)
    R = _group_incoming(slots, B, n, S)
    return B, jnp.concatenate([B, R], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("S", "C", "metric_name", "chunk", "n_chunks"),
)
def _nnd_block(
    tape,        # [n_pad, d] gather tape (bf16 on TPU, f32 on CPU)
    B,           # [n_pad, S] current top-S lists
    U,           # [n_pad, 2S] forward ∪ reverse
    cand_d_blk,  # [block, C] this block's running dists (f32 asc)
    cand_i_blk,  # [block, C] this block's running ids
    s0,          # i32 scalar: block start row
    S: int,
    C: int,
    metric_name: str,
    chunk: int,
    n_chunks: int,
):
    """One block of nodes through one NN-descent round: expand → score →
    merge. Runs as a single device program (eager per-chunk dispatch
    costs ~100 ms relay each through the tunneled device); blocks are
    streamed by the host so XLA pipelines consecutive dispatches —
    the same dispatch shape `exact_knn` settled on."""
    from vss_tpu.index.search import _dedupe_keep_first
    from vss_tpu.ops.distance import gathered_distances

    metric = Metric.parse(metric_name)
    W = 2 * S + 2 * S * S  # U ∪ B[U]

    def body(c, carry):
        out_d, out_i = carry
        r0 = s0 + c * chunk
        u = jax.lax.dynamic_slice_in_dim(U, r0, chunk)          # [chunk, 2S]
        p = jnp.take(B, jnp.maximum(u, 0), axis=0)              # [chunk, 2S, S]
        p = jnp.where((u >= 0)[:, :, None], p, -1)
        pool = jnp.concatenate([u, p.reshape(chunk, 2 * S * S)], axis=1)
        self_ids = r0 + jnp.arange(chunk, dtype=jnp.int32)
        pool = jnp.where(pool == self_ids[:, None], -1, pool)
        pv = jnp.take(tape, jnp.maximum(pool, 0), axis=0)       # [chunk, W, d]
        qv = jax.lax.dynamic_slice_in_dim(tape, r0, chunk).astype(
            jnp.float32
        )
        d = gathered_distances(qv, pv, metric)                  # [chunk, W]
        d = jnp.where(pool < 0, _INF, d)
        ecd = jax.lax.dynamic_slice_in_dim(out_d, c * chunk, chunk)
        eci = jax.lax.dynamic_slice_in_dim(out_i, c * chunk, chunk)
        all_i = jnp.concatenate([eci, pool], axis=1)            # [chunk, C+W]
        all_d = jnp.concatenate([ecd, d], axis=1)
        # duplicates (pool overlaps the running list and itself) would
        # eat top-C slots with copies; dedupe keeps the FIRST occurrence
        # — running-list entries win, so their (equal) distances survive
        all_i = _dedupe_keep_first(all_i)
        all_d = jnp.where(all_i < 0, _INF, all_d)
        neg, pos = jax.lax.top_k(-all_d, C)
        nd = -neg
        ni = jnp.take_along_axis(all_i, pos, axis=1)
        ni = jnp.where(jnp.isfinite(nd), ni, -1)
        return (
            jax.lax.dynamic_update_slice(out_d, nd, (c * chunk, 0)),
            jax.lax.dynamic_update_slice(out_i, ni, (c * chunk, 0)),
        )

    del W
    return jax.lax.fori_loop(0, n_chunks, body, (cand_d_blk, cand_i_blk))


def sampled_list_recall(
    xv: jax.Array,
    cand_i: jax.Array,
    metric,
    *,
    n_sample: int = 1024,
    k: int = 10,
    seed: int = 0,
    use_scan: bool = False,
) -> tuple[float, np.ndarray, np.ndarray]:
    """recall@k of the candidate LISTS on a node sample, against a
    brute-force oracle over all rows — the adaptive-rounds trigger.
    Returns (recall, sample_ids, oracle_ids) so callers re-check later
    rounds against the same oracle for free.

    use_scan: oracle via the chunked storage-native scan instead of the
    f32 brute force — `xv` may then be a quantized tape, and no second
    corpus-size f32 copy is materialized (the f32 oracle's padded copy
    OOM'd the 1M x 960 build on a 16 GB chip; a quantized oracle is
    exact w.r.t. the same values the candidate lists scored)."""
    from vss_tpu.ops import bruteforce_topk

    n = xv.shape[0]
    n_sample = min(n_sample, n)
    rng = np.random.default_rng(seed)
    sample = np.sort(rng.choice(n, n_sample, replace=False)).astype(np.int32)
    q = jnp.take(xv, jnp.asarray(sample), axis=0)
    # k+1 then drop self: the oracle scores every row incl. the query
    if use_scan:
        from vss_tpu.ops.scan import scan_topk

        xn = jax.jit(
            lambda t: jnp.sum(t.astype(jnp.float32) ** 2, axis=1)
        )(xv)
        _, ids = scan_topk(
            q.astype(jnp.float32), xv, k + 1, metric, x_norms=xn
        )
    else:
        _, ids = bruteforce_topk(q, xv, k + 1, metric)
    ids = np.asarray(ids)
    oracle = np.empty((n_sample, k), np.int32)
    for j, s in enumerate(sample):
        row = ids[j][ids[j] != s]
        oracle[j] = row[:k]
    got = np.asarray(jnp.take(cand_i, jnp.asarray(sample), axis=0))
    hits = sum(
        len(set(oracle[j].tolist()) & set(got[j][got[j] >= 0].tolist()))
        for j in range(n_sample)
    )
    return hits / (n_sample * k), sample, oracle


def _recall_against(cand_i, sample, oracle) -> float:
    got = np.asarray(jnp.take(cand_i, jnp.asarray(sample), axis=0))
    k = oracle.shape[1]
    hits = sum(
        len(set(oracle[j].tolist()) & set(got[j][got[j] >= 0].tolist()))
        for j in range(len(sample))
    )
    return hits / (len(sample) * k)


def nn_descent_refine(
    xv: jax.Array,
    cand_d: jax.Array,
    cand_i: jax.Array,
    metric,
    *,
    S: int = 16,
    max_rounds: int = 6,
    target_recall: float = 0.95,
    chunk: int = 4096,
    block_chunks: int = 4,
    seed: int = 0,
    progress: Optional[Callable[[int, int], None]] = None,
) -> tuple[jax.Array, jax.Array]:
    """Adaptively refine candidate lists in place of / after the IVF pass.

    xv [n, d] f32; cand_d/cand_i [n, C] per the exact_knn contract with
    ids POSITIONAL (ids == row index — what `build_graph_exact` passes).
    Measures sampled list recall@10 first; runs rounds only while it is
    below `target_recall` (clustered corpora typically pay only the
    ~0.2 s oracle check), re-measuring after each round and stopping
    early on convergence (< 0.5 pt gain) or `max_rounds`.
    """
    metric = Metric.parse(metric)
    n, d = xv.shape
    C = cand_i.shape[1]
    if n <= chunk:  # tiny inputs: exact pass upstream already covers
        return cand_d, cand_i
    _dbg = os.environ.get("VSS_EXACT_DEBUG") == "1"
    t0 = time.perf_counter()

    def _say(msg):
        if _dbg:
            print(f"[nnd] {msg} ({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr, flush=True)

    rec, sample, oracle = sampled_list_recall(
        xv, cand_i, metric, seed=seed
    )
    _say(f"seed lists recall@10={rec:.4f}")
    if rec >= target_recall:
        return cand_d, cand_i

    from vss_tpu.utils import use_pallas

    n_pad = round_up(n, chunk)
    pad = n_pad - n
    tape = xv.astype(jnp.bfloat16) if use_pallas() else xv
    if pad:
        tape = jnp.pad(tape, ((0, pad), (0, 0)))
        cand_d = jnp.pad(cand_d, ((0, pad), (0, 0)), constant_values=_INF)
        cand_i = jnp.pad(cand_i, ((0, pad), (0, 0)), constant_values=-1)

    block = block_chunks * chunk
    for r in range(max_rounds):
        B, U = _reverse_union(cand_i, S)
        parts_d, parts_i = [], []
        lag = 3
        for s in range(0, n_pad, block):
            nb = min(block, n_pad - s) // chunk
            bd, bi = _nnd_block(
                tape, B, U,
                jax.lax.dynamic_slice_in_dim(cand_d, s, nb * chunk),
                jax.lax.dynamic_slice_in_dim(cand_i, s, nb * chunk),
                jnp.int32(s), S, C, metric.value, chunk, nb,
            )
            parts_d.append(bd)
            parts_i.append(bi)
            if len(parts_i) > lag:
                jax.block_until_ready(parts_i[-1 - lag])
                if progress is not None:
                    progress(s, n_pad)
        cand_d = jnp.concatenate(parts_d)
        cand_i = jnp.concatenate(parts_i)
        new_rec = _recall_against(cand_i, sample, oracle)
        _say(f"round {r + 1}: recall@10={new_rec:.4f}")
        if new_rec >= target_recall or new_rec - rec < 0.005:
            rec = new_rec
            break
        rec = new_rec

    if pad:
        cand_d = cand_d[:n]
        cand_i = cand_i[:n]
    # the merged distances were scored on the bf16 gather tape; the
    # contract (and the refine heuristic downstream) wants ascending
    # f32 — top_k already sorted each row, dtype is already f32
    return cand_d, cand_i
