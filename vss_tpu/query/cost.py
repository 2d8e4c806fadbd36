"""Cost-based plan choice between the HNSW graph and the exact MXU scan.

The reference has no such component: on a CPU the graph is the only
viable operator, so its optimizers rewrite unconditionally
(`/root/reference/src/hnsw/hnsw_optimize_scan.cpp`,
`hnsw_optimize_join.cpp`). On a TPU the exact scan is a sequential
HBM-bandwidth stream through the MXU and *beats the graph outright* for
large query batches over HBM-resident corpora (measured: at 1M x 128-d
f32, a 512-query exact batch runs ~0.8 ms while 512 beam searches take
tens of ms — see docs/BENCH.md), while the graph wins for small batches
over large corpora (one query streams nothing but ~ef·M neighbor rows).

This module scores both operators with a two-parameter bandwidth model:

  exact   ~ ceil(B / QBATCH) * N * d * itemsize / STREAM_BW
  graph   ~ B * ITERS(ef, expand) * expand * M0 * row_fetch / RANDOM_BW
            + B * ITER_OVERHEAD

STREAM_BW is the sequential HBM rate the exact kernel sustains and
RANDOM_BW the effective rate of random single-row gathers (a few percent
of peak — each beam step fetches scattered rows); both were fit to the
flagship measurements in docs/BENCH.md and are deliberately coarse: the
decision only has to be right when the two operators are orders of
magnitude apart, which is exactly when it matters.

Disabled by default (`SET hnsw_cost_model = true` to enable) so the
default plan shapes stay reference-parity: the reference always picks the
index, and its tests assert HNSW_INDEX_SCAN / HNSW_INDEX_JOIN in EXPLAIN.
"""
from __future__ import annotations

# EFFECTIVE rate of the exact-scan kernel over the table (bytes/s).
# Fit to the shipped kernel (BENCH_r02.json mfu block): 20.2 ms per
# 512-query batch at 1M x 128 f32 at HIGHEST precision = 25.3 GB/s
# effective (the kernel is grid-step- and 6-pass-matmul-bound, not
# HBM-bound; raw HBM streams at 800 GB/s). Re-fit when the kernel
# improves — CPU runs only need the *ratio* to RANDOM_BW to make the
# same relative choice.
STREAM_BW = 25.3e9
# Effective random row-gather rate of the beam search (bytes/s), fit to
# the BENCH_r02 flagship point: 27,847 qps at ef=48 expand=1 int8
# (row = max(128 B, MIN_FETCH) = 256 B model bytes) -> 35.9 us/query;
# minus QUERY_OVERHEAD, beam_iters(48,1)*32*256 B / 27.9 us = 29.4 GB/s.
# The done-latch retires queries before max_iters, so this effective
# rate exceeds the raw ~5 GB/s gather figure the MFU audit reports.
RANDOM_BW = 29.4e9
# Fixed per-query-per-search overhead (s): while_loop step latency that
# doesn't scale with row width.
QUERY_OVERHEAD = 8e-6
# Query rows the exact kernel amortizes per pass (its batch tile).
QBATCH = 512
# Minimum bytes a random row fetch occupies end-to-end (DMA descriptor +
# HBM burst granularity): short rows don't fetch faster than this.
MIN_FETCH = 256.0
# Effective rates of the STORAGE-NATIVE segmin scan (ops/scan.scan_topk)
# over the index tape, by tape itemsize. int8 fit to the round-4 keep
# sweep: 64,241 qps at 512-query batches over 1M x 128 int8 =
# 7.97 ms/batch for a 128 MB tape stream = 16.1 GB/s effective (the
# kernel also pays the byte-plane decode + f32 rerank inside that
# time; keep = k+2 winnow margin). bf16 MEASURED at the same config:
# 58,492 qps = 8.75 ms/batch over a 256 MB tape = 29.2 GB/s effective
# at recall 1.00000 — bf16 skips the byte-plane decode, so it streams
# 2.4x the int8 effective rate and serves within 7% of int8's QPS at
# exact recall. f32 tapes route to the plain bruteforce matmul
# (STREAM_BW).
TAPE_BW = {1: 16.1e9, 2: 29.2e9, 4: STREAM_BW}


def beam_iters(ef: int, expand: int) -> float:
    """Fixed-bound iteration count of the batched beam
    (index/search.py: max_iters = 4 + 2*ef/expand; typical searches run
    near the bound before the done-latch covers the batch)."""
    return 4 + (2 * ef) / max(expand, 1)


def exact_cost_s(
    n_rows: int, dims: int, itemsize: int, n_queries: int,
    tape_scan: bool = False,
) -> float:
    """Wall-clock estimate of one exact pass over the whole table.

    tape_scan=False prices the f32 table-column matmul
    (BRUTE_FORCE_TOPK); tape_scan=True prices the storage-native segmin
    scan over the index tape at `itemsize` (EXACT_SCAN_TOPK) — int8
    streams ~4x fewer bytes, which is why the planner prefers it at
    flagship scale for batched queries."""
    passes = max(1, -(-n_queries // QBATCH))
    bw = TAPE_BW.get(itemsize, STREAM_BW) if tape_scan else STREAM_BW
    return passes * (n_rows * dims * itemsize) / bw


def graph_cost_s(
    n_queries: int,
    dims: int,
    itemsize: int,
    ef: int,
    m0: int,
    expand: int = 2,
) -> float:
    """Wall-clock estimate of `n_queries` beam searches."""
    row = max(dims * itemsize, MIN_FETCH)
    fetched = beam_iters(ef, expand) * expand * m0 * row
    return n_queries * (fetched / RANDOM_BW + QUERY_OVERHEAD)


def prefer_exact(
    n_rows: int,
    dims: int,
    itemsize: int,
    n_queries: int,
    ef: int,
    m0: int,
    expand: int = 2,
    tape_scan: bool = False,
) -> bool:
    """True when the exact scan is estimated cheaper than the graph for
    this (corpus, batch) — the hybrid-planner decision point.
    `tape_scan` selects the storage-native tape-scan pricing (see
    exact_cost_s); pass the TAPE itemsize with it."""
    return exact_cost_s(
        n_rows, dims, itemsize, n_queries, tape_scan=tape_scan
    ) < graph_cost_s(n_queries, dims, itemsize, ef, m0, expand)


def serving_path(
    n_rows: int,
    dims: int,
    tape_itemsize: int,
    n_queries: int,
    ef: int,
    m0: int,
    expand: int = 2,
) -> str:
    """'scan' or 'graph' — the engine-owned serving decision for a
    batched workload over an index with a native-scannable tape (the
    logic bench.py used to carry privately; the planner and the bench
    now both ask here)."""
    return (
        "scan"
        if prefer_exact(
            n_rows, dims, tape_itemsize, n_queries, ef, m0, expand,
            tape_scan=True,
        )
        else "graph"
    )
