"""Flagship benchmark: synthetic-SIFT1M build + top-10 query QPS/recall.

Run on one real TPU chip by the driver. Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...,
   plus auxiliary fields (recall@10, build rows/s, config)}.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline
is measured QPS divided by 10_000 — a representative usearch-on-CPU
single-node SIFT1M throughput at the same defaults (M=16, ef=64), stated
here explicitly since no published figure exists.

Environment knobs:
  VSS_BENCH_N        rows            (default 1_000_000; 20_000 on CPU)
  VSS_BENCH_D        dims            (default 128)
  VSS_BENCH_NQ       queries         (default 10_000)
  VSS_BENCH_K        top-k           (default 10)
  VSS_BENCH_EF       ef_search       (default 64)
  VSS_BENCH_WAVE     build wave size (default 1024)
  VSS_BENCH_EXPAND   build beam expansion   (default 4)
  VSS_BENCH_ESEARCH  search beam expansion  (default 2)
  VSS_BENCH_QBATCH   query batch            (default 512)
  VSS_BENCH_METRIC   l2sq|cosine|ip         (default l2sq)
  VSS_BENCH_STORAGE  f32|bf16|int8          (default f32)
  VSS_BENCH_RECALL_TARGET  ef escalates until recall >= this (default 0.90)
  VSS_BENCH_DELETES  fraction to tombstone+compact+requery (default 0 = skip)
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _ensure_backend():
    """The axon TPU tunnel intermittently refuses session claims; the
    backend registration happens at interpreter start, so recovery needs a
    fresh process — re-exec with a bounded retry counter."""
    try:
        import jax

        jax.devices()
        return
    except Exception as e:
        attempt = int(os.environ.get("VSS_BENCH_ATTEMPT", "0"))
        if attempt >= 10:
            log(f"[bench] backend init failed permanently: {e}")
            raise
        log(f"[bench] backend init failed (attempt {attempt}), retrying in 60s")
        time.sleep(60)
        env = dict(os.environ)
        env["VSS_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    _ensure_backend()
    import jax

    # persistent compile cache: the remote-compile tunnel costs minutes per
    # computation; cache across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from vss_tpu.index import HNSWConfig, hnsw_search
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.ops import bruteforce_topk

    on_cpu = jax.default_backend() == "cpu"
    N = int(os.environ.get("VSS_BENCH_N", 20_000 if on_cpu else 1_000_000))
    D = int(os.environ.get("VSS_BENCH_D", 128))
    NQ = int(os.environ.get("VSS_BENCH_NQ", 1_000 if on_cpu else 10_000))
    K = int(os.environ.get("VSS_BENCH_K", 10))
    EF = int(os.environ.get("VSS_BENCH_EF", 64))
    WAVE = int(os.environ.get("VSS_BENCH_WAVE", 1024))
    EXPAND = int(os.environ.get("VSS_BENCH_EXPAND", 4))
    DEL_FRAC = float(os.environ.get("VSS_BENCH_DELETES", 0))
    METRIC = os.environ.get("VSS_BENCH_METRIC", "l2sq")
    STORAGE = os.environ.get("VSS_BENCH_STORAGE", "f32")
    QBATCH = int(os.environ.get("VSS_BENCH_QBATCH", 512))
    ESEARCH = int(os.environ.get("VSS_BENCH_ESEARCH", 2))

    log(f"[bench] backend={jax.default_backend()} N={N} D={D} NQ={NQ} K={K} EF={EF}")
    rng = np.random.default_rng(0)
    # SIFT-like synthetic (no dataset downloads in this environment):
    # clustered points in [0, 255]^D, mirroring SIFT's byte-valued
    # descriptors and cluster structure. i.i.d. gaussian would be a
    # near-orthogonal worst case no real ANN corpus resembles.
    n_centers = max(64, N // 2000)
    centers = rng.uniform(0, 255, (n_centers, D))
    vecs = np.clip(
        centers[rng.integers(0, n_centers, N)] + rng.normal(0, 25, (N, D)), 0, 255
    ).astype(np.float32)
    queries = np.clip(
        centers[rng.integers(0, n_centers, NQ)] + rng.normal(0, 25, (NQ, D)), 0, 255
    ).astype(np.float32)

    cfg = HNSWConfig(dims=D, metric=METRIC, ef_search=EF, storage_dtype=STORAGE)

    # ground truth FIRST, then free the device copy of the dataset before
    # the build allocates its tape (a 1M x 960-d run double-buffering the
    # dataset plus scan workspace exhausts a 16GB chip otherwise)
    log("[bench] ground truth...")
    if DEL_FRAC > 0:
        dead = rng.choice(N, int(N * DEL_FRAC), replace=False)
        alive_mask = np.ones(N, bool)
        alive_mask[dead] = False
    xs = jnp.asarray(vecs)
    # pre-upload query batches once: host<->device transfers must not
    # pollute throughput numbers (they are pipelined/overlapped in any
    # real serving setup, and this dev chip sits behind a slow tunnel)
    nq_pad = ((NQ + QBATCH - 1) // QBATCH) * QBATCH
    q_pad = np.zeros((nq_pad, D), np.float32)
    q_pad[:NQ] = queries
    q_batches = [
        jnp.asarray(q_pad[s : s + QBATCH]) for s in range(0, nq_pad, QBATCH)
    ]
    jax.block_until_ready(q_batches[-1])
    # warm the scan (compile excluded from the timed pass)
    jax.block_until_ready(bruteforce_topk(q_batches[0], xs, K, METRIC)[0])
    outs = []
    t0 = time.perf_counter()
    for qb in q_batches:
        outs.append(bruteforce_topk(qb, xs, K, METRIC)[1])
    jax.block_until_ready(outs[-1])
    brute_s = time.perf_counter() - t0
    gt = np.concatenate([np.asarray(o) for o in outs])[:NQ]
    brute_qps = NQ / brute_s
    log(f"[bench] brute force {brute_s:.1f}s ({brute_qps:.0f} qps)")
    gt_deleted = None
    if DEL_FRAC > 0:
        _, ids2 = bruteforce_topk(
            jnp.asarray(queries[:QBATCH]), xs, K, METRIC,
            valid_mask=jnp.asarray(alive_mask),
        )
        gt_deleted = np.asarray(ids2)
    del xs
    jax.clear_caches()  # also drops cached scan workspaces

    log("[bench] building index...")
    t0 = time.perf_counter()

    def _progress(done, n):
        if done <= WAVE or done % (WAVE * 32) < WAVE or done >= n:
            log(f"[bench] build {done}/{n} ({time.perf_counter() - t0:.0f}s)")

    idx = HNSWIndex.build(vecs, cfg, wave_size=WAVE, expand=EXPAND,
                          method="wave", progress=_progress)
    jax.block_until_ready(idx.graph.vectors)
    build_s = time.perf_counter() - t0
    build_rows_per_s = N / build_s
    log(f"[bench] build {build_s:.1f}s ({build_rows_per_s:.0f} rows/s)")

    # timed index search; escalate ef until the recall target is met so
    # the headline (QPS, recall) pair is reported at one setting
    graph, config = idx.graph, idx.config

    def run_at(ef):
        def search_batch(qb):
            d, slots = hnsw_search(graph, config, qb, k=K, ef=ef, expand=ESEARCH,
                                   assume_all_valid=True)
            rows = jnp.where(
                slots >= 0,
                jnp.take(graph.slot_to_rowid, jnp.maximum(slots, 0)),
                -1,
            )
            return d, rows

        jax.block_until_ready(search_batch(q_batches[0]))  # compile
        results = []
        t0 = time.perf_counter()
        for qb in q_batches:
            results.append(search_batch(qb)[1])
        jax.block_until_ready(results[-1])
        search_s = time.perf_counter() - t0
        got = np.concatenate([np.asarray(r) for r in results])[:NQ]
        hits = sum(
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            for a, b in zip(got, gt)
        )
        return NQ / search_s, hits / (NQ * K)

    RECALL_TARGET = float(os.environ.get("VSS_BENCH_RECALL_TARGET", 0.90))
    ef_used = EF
    log("[bench] searching...")
    qps, rec = run_at(ef_used)
    log(f"[bench] ef={ef_used}: {qps:.0f} qps recall@{K}={rec:.4f}")
    for ef_try in (96, 128, 192):
        if rec >= RECALL_TARGET or ef_try <= ef_used:
            break
        ef_used = ef_try
        qps, rec = run_at(ef_used)
        log(f"[bench] ef={ef_used}: {qps:.0f} qps recall@{K}={rec:.4f}")

    extra = {}
    if DEL_FRAC > 0:
        n_del = int(N * DEL_FRAC)
        log(f"[bench] deleting {n_del} rows + compact + requery...")
        idx.delete(dead.tolist())
        idx.compact()
        d2, rows2 = idx.search(queries[:QBATCH], k=K, ef=ef_used)
        hits2 = sum(
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            for a, b in zip(np.asarray(rows2), gt_deleted)
        )
        extra["recall_after_compact"] = round(hits2 / gt_deleted.size, 4)
        extra["deleted_fraction"] = DEL_FRAC

    out = {
        "metric": f"synthetic_sift_n{N}_d{D}_{METRIC}_qps_per_chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10_000.0, 4),
        "recall_at_k": round(rec, 4),
        "k": K,
        "ef_search": ef_used,
        "build_rows_per_s": round(build_rows_per_s, 1),
        "build_seconds": round(build_s, 1),
        "brute_force_qps": round(brute_qps, 1),
        "backend": jax.default_backend(),
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
