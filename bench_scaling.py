"""Sharded scaling harness: build + QPS at increasing shard counts.

BASELINE.md's scaling config (1 chip -> 1 host -> 4 hosts, >=80% QPS
efficiency) needs real multi-chip hardware; this environment exposes one
chip. This harness runs the full sharded path (round-robin partition,
lock-step shard_map build, broadcast search, all_gather merge) on whatever
mesh exists, so on a pod slice it measures true scaling; on the 8-device
virtual CPU mesh it validates the machinery and reports *relative*
efficiency (virtual devices share one socket — treat CPU numbers as a
harness check, not hardware scaling).

Prints one JSON line: per-shard-count build rows/s, QPS, and efficiency
relative to the smallest shard count.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("VSS_SCALING_CPU", "1") == "1" and jax.default_backend() != "tpu":
        # ensure the virtual 8-device CPU mesh when not on TPU hardware
        pass
    import jax.numpy as jnp

    from vss_tpu.index import HNSWConfig
    from vss_tpu.ops import bruteforce_topk
    from vss_tpu.parallel import ShardedHNSWIndex, make_mesh

    n_dev = len(jax.devices())
    N = int(os.environ.get("VSS_SCALING_N", 40_000))
    D = int(os.environ.get("VSS_SCALING_D", 64))
    NQ = int(os.environ.get("VSS_SCALING_NQ", 512))
    K = int(os.environ.get("VSS_SCALING_K", 10))
    shard_counts = [
        s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev
    ]
    rng = np.random.default_rng(0)
    nc = 64
    C = rng.uniform(0, 255, (nc, D))
    vecs = np.clip(
        C[rng.integers(0, nc, N)] + rng.normal(0, 25, (N, D)), 0, 255
    ).astype(np.float32)
    queries = np.clip(
        C[rng.integers(0, nc, NQ)] + rng.normal(0, 25, (NQ, D)), 0, 255
    ).astype(np.float32)
    cfg = HNSWConfig(dims=D)

    _, gt = bruteforce_topk(jnp.asarray(queries), jnp.asarray(vecs), K, "l2sq")
    gt = np.asarray(gt)

    results = []
    for S in shard_counts:
        mesh = make_mesh(S)
        t0 = time.perf_counter()
        idx = ShardedHNSWIndex.build(vecs, cfg, mesh, wave_size=512)
        jax.block_until_ready(idx.graphs.vectors)
        build_s = time.perf_counter() - t0
        d, rows = idx.search(queries, k=K, ef=64)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            d, rows = idx.search(queries, k=K, ef=64)
        jax.block_until_ready(d)
        qps = NQ / ((time.perf_counter() - t0) / reps)
        rows = np.asarray(rows)
        hits = sum(
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            for a, b in zip(rows, gt)
        )
        rec = hits / (NQ * K)
        results.append(
            {
                "shards": S,
                "build_rows_per_s": round(N / build_s, 1),
                "qps": round(qps, 1),
                "recall_at_k": round(rec, 4),
            }
        )
        log(f"[scaling] S={S}: {results[-1]}")

    base = results[0]["qps"]
    for r in results:
        r["qps_efficiency"] = round(r["qps"] / (base * r["shards"]), 4)
    print(
        json.dumps(
            {
                "metric": "sharded_scaling",
                "backend": jax.default_backend(),
                "n_devices": n_dev,
                "note": "virtual CPU devices share one socket; hardware "
                "scaling requires a real pod slice",
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
