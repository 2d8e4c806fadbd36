"""A/B: HNSW beam search with XLA gather vs fused Pallas gather+score.

Builds (or loads from .bench_cache) a 1M x 128 synthetic-SIFT index, then
slope-times the batched search in-graph (a jitted fori_loop over query
batches with a data-dependency chain — see benchmarks/micro2.py for why
dispatch-level timing lies on this relay).

Env: VSS_AB_N (1M), VSS_AB_D (128), VSS_AB_EF (64), VSS_AB_EXPAND (2),
VSS_AB_B (512), VSS_AB_STORAGE (f32), VSS_AB_BUILD_FUSED (unset=auto)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vss_tpu.index import HNSWConfig
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.index.search import _hnsw_search_impl
    from vss_tpu.ops import bruteforce_topk
    from vss_tpu.storage import load_index, save_index

    N = int(os.environ.get("VSS_AB_N", 1_000_000))
    D = int(os.environ.get("VSS_AB_D", 128))
    B = int(os.environ.get("VSS_AB_B", 512))
    EF = int(os.environ.get("VSS_AB_EF", 64))
    EXPAND = int(os.environ.get("VSS_AB_EXPAND", 2))
    K = 10
    STORAGE = os.environ.get("VSS_AB_STORAGE", "f32")
    cache = f"/root/repo/.bench_cache/ab_n{N}_d{D}_{STORAGE}.vss"

    rng = np.random.default_rng(0)
    n_centers = max(64, N // 2000)
    centers = rng.uniform(0, 255, (n_centers, D))
    vecs = np.clip(
        centers[rng.integers(0, n_centers, N)] + rng.normal(0, 25, (N, D)), 0, 255
    ).astype(np.float32)
    queries = np.clip(
        centers[rng.integers(0, n_centers, 4 * B)] + rng.normal(0, 25, (4 * B, D)),
        0, 255,
    ).astype(np.float32)
    cfg = HNSWConfig(dims=D, metric="l2sq", ef_search=EF, storage_dtype=STORAGE)

    if os.path.exists(cache):
        log(f"loading cached index {cache}")
        idx = load_index(cache)
        build_rows_s = None
    else:
        bf = os.environ.get("VSS_AB_BUILD_FUSED")
        bf = None if bf is None else bf == "1"
        log("building 1M index (wave)...")
        t0 = time.perf_counter()
        idx = HNSWIndex.build(
            vecs, cfg, wave_size=1024, expand=4, method="wave",
            progress=lambda done, n: (
                log(f"  build {done}/{n} ({time.perf_counter()-t0:.0f}s)")
                if done % (1024 * 64) < 1024
                else None
            ),
        )
        jax.block_until_ready(idx.graph.vectors)
        # force real completion before trusting the time
        _ = float(np.asarray(idx.graph.adj0[0, 0]))
        build_s = time.perf_counter() - t0
        build_rows_s = N / build_s
        log(f"build: {build_s:.0f}s = {build_rows_s:.0f} rows/s")
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        save_index(idx, cache)

    graph, config = idx.graph, idx.config
    qs = jnp.asarray(queries.reshape(4, B, D))
    allow = graph.valid

    from functools import partial

    @partial(jax.jit, static_argnames=("iters", "fused"))
    def search_loop(graph, qs, allow, iters: int, fused: bool):
        def body(i, carry):
            acc, delta = carry
            q = qs[i % 4] + delta
            d, sl, it, ev = _hnsw_search_impl(
                graph, config, q, allow, K, EF, EXPAND,
                0, False, True, fused,
            )
            s = d[0, 0]
            return acc + s, delta + s * 1e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.float32(0)))
        return acc

    def slope(fn, lo=2, hi=8):
        _ = float(np.asarray(fn(lo)))
        _ = float(np.asarray(fn(hi)))
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(lo)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(hi)))
        t_hi = time.perf_counter() - t0
        return (t_hi - t_lo) / (hi - lo)

    # ground truth on the first batch for recall
    gt_d, gt_i = bruteforce_topk(qs[0], jnp.asarray(vecs), K, "l2sq")
    gt = np.asarray(gt_i)

    out = {}
    if build_rows_s:
        out["build_rows_per_s"] = round(build_rows_s, 1)

    def measure(fused, expand, use_hist, ef=EF, qstack=qs, label=""):
        nb_, B_ = qstack.shape[0], qstack.shape[1]

        @partial(jax.jit, static_argnames=("iters",))
        def loop(graph, qstack, allow, iters: int):
            def body(i, carry):
                acc, delta = carry
                q = qstack[i % nb_] + delta
                d, sl, it, ev = _hnsw_search_impl(
                    graph, config, q, allow, K, ef, expand, 0, False,
                    use_hist, fused,
                )
                s = d[0, 0]
                return acc + s, delta + s * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0), jnp.float32(0))
            )
            return acc

        per = slope(lambda it: loop(graph, qstack, allow, it))
        qps = B_ / per
        d, sl, iters, evals = _hnsw_search_impl(
            graph, config, qstack[0], allow, K, ef, expand, 0, False,
            use_hist, fused,
        )
        rows = np.asarray(
            jnp.where(sl >= 0, jnp.take(graph.slot_to_rowid, jnp.maximum(sl, 0)), -1)
        )[: gt.shape[0]]
        hits = sum(
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            for a, b in zip(rows, gt)
        )
        rec = hits / gt.size
        key = label or f"{'fused' if fused else 'xla'}_E{expand}_h{int(use_hist)}_ef{ef}_B{B_}"
        out[f"{key}_qps"] = round(qps, 1)
        out[f"{key}_recall"] = round(rec, 4)
        log(f"{key}: {per*1e3:.2f}ms/batch -> {qps:.0f} qps, "
            f"recall@10={rec:.4f}, iters={int(iters)}, evals={int(evals)}")
        return qps, rec

    # --- variant sweep (XLA gather is the fast path per micro2)
    best = (0.0, None)
    for fused, expand, use_hist in (
        (False, 2, True),   # round-1 configuration
        (False, 4, True),
        (False, 8, True),
        (False, 4, False),
        (False, 8, False),
        (True, 4, False),   # fused sanity point
    ):
        try:
            qps, rec = measure(fused, expand, use_hist)
            if rec >= 0.95 and qps > best[0]:
                best = (qps, (fused, expand, use_hist))
        except Exception as e:
            log(f"variant E{expand} h{use_hist} fused={fused} FAILED: "
                f"{type(e).__name__}: {e}")

    # --- per-iteration decomposition on the E=4 variant
    @partial(jax.jit, static_argnames=("iters", "max_it"))
    def iters_loop(graph, qstack, allow, iters: int, max_it: int):
        def body(i, carry):
            acc, delta = carry
            d, sl, it, ev = _hnsw_search_impl(
                graph, config, qstack[i % 4] + delta, allow, K, EF, 4,
                max_it, False, True, False,
            )
            s = d[0, 0]
            return acc + s, delta + s * 1e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.float32(0)))
        return acc

    try:
        per8 = slope(lambda it: iters_loop(graph, qs, allow, it, 8))
        per40 = slope(lambda it: iters_loop(graph, qs, allow, it, 40))
        per_beam_iter = (per40 - per8) / 32
        out["per_beam_iter_ms"] = round(per_beam_iter * 1e3, 3)
        out["descent_plus_fixed_ms"] = round((per8 - 8 * per_beam_iter) * 1e3, 3)
        log(f"decomposition: {per_beam_iter*1e3:.3f}ms/beam-iter, "
            f"{(per8 - 8*per_beam_iter)*1e3:.2f}ms descent+fixed")
    except Exception as e:
        log(f"decomposition FAILED: {e}")

    # --- batch-size scaling on the best variant (or E=4 default)
    fused_b, expand_b, hist_b = best[1] or (False, 4, True)
    q2 = jnp.asarray(queries.reshape(2, 2 * B, D))
    try:
        measure(fused_b, expand_b, hist_b, qstack=q2)
    except Exception as e:
        log(f"B=1024 FAILED: {e}")

    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
