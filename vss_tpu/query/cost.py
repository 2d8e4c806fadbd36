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

The module constants below are point-fits to the dev chip; on other
hardware run `calibrate()` once (or `python -m vss_tpu calibrate`) — a
~1 s probe (warm compile cache) that measures the actual tape-scan,
f32-stream, and random-gather rates and persists them per backend to
`~/.cache/vss_tpu/cost_<backend>.json`, auto-loaded afterwards. The
decision only needs rates at the right order of magnitude, which is why
the shipped fallbacks are acceptable on the chip family they were fit
on and a single probe suffices anywhere else.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

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


# Ratio of the beam search's EFFECTIVE random-fetch rate to the raw
# single-row gather rate (29.4 / 9.4 on the dev chip): the done-latch
# retires queries early, an algorithmic property that transfers across
# hardware — a raw gather probe times the denominator, the planner needs
# the numerator.
_EFFECTIVE_GATHER_FACTOR = 29.4 / 9.4

_LOADED: Optional[dict] = None


def _cache_path() -> Optional[str]:
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        return None
    root = os.environ.get(
        "VSS_COST_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "vss_tpu"),
    )
    return os.path.join(root, f"cost_{backend}.json")


def _rates() -> dict:
    """Active rate set: shipped fits, overlaid by a persisted
    calibration for this backend when one exists."""
    global _LOADED
    if _LOADED is None:
        _LOADED = {
            "stream_bw": STREAM_BW,
            "random_bw": RANDOM_BW,
            "tape_bw": dict(TAPE_BW),
        }
        p = _cache_path()
        if p and os.path.exists(p):
            try:
                with open(p) as f:
                    d = json.load(f)
                _LOADED["stream_bw"] = float(d.get("stream_bw", STREAM_BW))
                _LOADED["random_bw"] = float(d.get("random_bw", RANDOM_BW))
                _LOADED["tape_bw"].update(
                    {int(k): float(v) for k, v in d.get("tape_bw", {}).items()}
                )
            except (OSError, ValueError):
                pass
    return _LOADED


def calibrate(persist: bool = True, n_rows: int = 1 << 18) -> dict:
    """One-shot runtime probe of the serving-path rate constants.

    Measures (slope-timed in-graph, same methodology as bench.py):
      - the storage-native tape-scan rate at int8 and bf16 itemsizes
        (`ops/scan.scan_topk` over an n_rows x 128 tape),
      - the f32 brute-force stream rate (`ops/topk.bruteforce_topk`),
      - the raw random row-gather rate, scaled by the done-latch
        effectiveness factor to the beam's effective rate.

    ~1 s with a warm compile cache; a cold process pays the usual
    per-program compiles. Persists to `~/.cache/vss_tpu/` (overridable
    via VSS_COST_CACHE_DIR) and becomes the active rate set. Returns the
    measured dict.
    """
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    from vss_tpu.ops.scan import native_scan_supported, scan_topk
    from vss_tpu.ops.topk import bruteforce_topk

    D, QB, K = 128, 256, 10
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (n_rows, D), jnp.float32) * 40.0
    q = xf[:QB] + 1.0
    valid = jnp.ones((n_rows,), jnp.bool_)

    def slope(fn, lo=4, hi=16, trials=3):
        _ = float(np.ravel(np.asarray(fn(lo)))[0])
        _ = float(np.ravel(np.asarray(fn(hi)))[0])
        deltas = []
        for _t in range(trials):
            t0 = time.perf_counter()
            _ = float(np.ravel(np.asarray(fn(lo)))[0])
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.ravel(np.asarray(fn(hi)))[0])
            deltas.append(time.perf_counter() - t0 - t_lo)
        pos = [x for x in deltas if x > 0] or [max(max(deltas), 1e-7)]
        return min(pos) / (hi - lo)

    out: dict = {"tape_bw": {}}

    def scan_rate(tape, xn):
        @partial(jax.jit, static_argnames=("iters",))
        def loop(q, tape, xn, valid, iters: int):
            def body(i, carry):
                acc, delta = carry
                d, _ = scan_topk(q + delta, tape, K, "l2sq",
                                 valid_mask=valid, x_norms=xn)
                s = d[0, 0]
                return acc + s, delta + s * 1e-30

            return jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0), jnp.float32(0))
            )[0]

        per = slope(lambda it: loop(q, tape, xn, valid, it))
        return n_rows * D * jnp.dtype(tape.dtype).itemsize / per

    if native_scan_supported(jnp.int8):
        tape8 = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
        xn8 = jnp.sum(tape8.astype(jnp.float32) ** 2, axis=1)
        try:
            out["tape_bw"][1] = scan_rate(tape8, xn8)
            tape16 = xf.astype(jnp.bfloat16)
            xn16 = jnp.sum(tape16.astype(jnp.float32) ** 2, axis=1)
            out["tape_bw"][2] = scan_rate(tape16, xn16)
        except Exception:
            out["tape_bw"] = {}

    @partial(jax.jit, static_argnames=("iters",))
    def brute_loop(q, xf, iters: int):
        def body(i, carry):
            acc, delta = carry
            d, _ = bruteforce_topk(q + delta, xf, K, "l2sq")
            s = d[0, 0]
            return acc + s, delta + s * 1e-30

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), jnp.float32(0))
        )[0]

    per = slope(lambda it: brute_loop(q, xf, it))
    out["stream_bw"] = n_rows * D * 4 / per
    out["tape_bw"][4] = out["stream_bw"]

    # raw random row gather at the beam's row width, x effectiveness
    n_idx = 1 << 16
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_idx,), 0, n_rows)

    @partial(jax.jit, static_argnames=("iters",))
    def gather_loop(xf, idx, iters: int):
        def body(i, carry):
            acc, delta = carry
            g = jnp.take(xf, (idx + delta.astype(jnp.int32)) % n_rows,
                         axis=0)
            s = g[0, 0]
            return acc + s, delta + s * 1e-30

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), jnp.float32(0))
        )[0]

    per_g = slope(lambda it: gather_loop(xf, idx, it))
    raw = n_idx * max(D * 4.0, MIN_FETCH) / per_g
    out["random_bw"] = raw * _EFFECTIVE_GATHER_FACTOR

    global _LOADED
    active = _rates()
    active["stream_bw"] = out["stream_bw"]
    active["random_bw"] = out["random_bw"]
    active["tape_bw"].update(out["tape_bw"])
    if persist:
        p = _cache_path()
        if p:
            try:
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "w") as f:
                    json.dump(
                        {
                            "stream_bw": out["stream_bw"],
                            "random_bw": out["random_bw"],
                            "tape_bw": out["tape_bw"],
                        },
                        f,
                    )
            except OSError:
                pass
    return out


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
    r = _rates()
    bw = (
        r["tape_bw"].get(itemsize, r["stream_bw"]) if tape_scan
        else r["stream_bw"]
    )
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
    return n_queries * (fetched / _rates()["random_bw"] + QUERY_OVERHEAD)


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
