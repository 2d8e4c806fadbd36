"""A/B: HNSW beam-search variants on a 1M index (slope-timed in-graph).

Builds (or loads from .bench_cache) a 1M x 128 synthetic-SIFT index, then
slope-times the batched search in-graph (a jitted fori_loop over query
batches with a data-dependency chain — see benchmarks/micro2.py for why
dispatch-level timing lies on this relay). Sweeps seeding mode (greedy
descent vs pivot scan), beam expansion, ef, and the iteration cap.

Env: VSS_AB_N (1M), VSS_AB_D (128), VSS_AB_EF (64), VSS_AB_B (512),
VSS_AB_STORAGE (f32), VSS_AB_METHOD (exact|wave, default exact)
"""
import json
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
    from functools import partial

    from vss_tpu.index import HNSWConfig
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.index.search import _hnsw_search_impl
    from vss_tpu.ops import bruteforce_topk
    from vss_tpu.storage import load_index, save_index

    N = int(os.environ.get("VSS_AB_N", 1_000_000))
    D = int(os.environ.get("VSS_AB_D", 128))
    B = int(os.environ.get("VSS_AB_B", 512))
    EF = int(os.environ.get("VSS_AB_EF", 64))
    K = 10
    STORAGE = os.environ.get("VSS_AB_STORAGE", "f32")
    METHOD = os.environ.get("VSS_AB_METHOD", "exact")
    cache = f"/root/repo/.bench_cache/ab_{METHOD}_n{N}_d{D}_{STORAGE}.vss"

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

    out = {}
    if os.path.exists(cache):
        log(f"loading cached index {cache}")
        idx = load_index(cache)
    else:
        log(f"building 1M index ({METHOD})...")
        t0 = time.perf_counter()
        idx = HNSWIndex.build(
            vecs, cfg, method=METHOD,
            progress=lambda done, n: log(
                f"  build {done}/{n} ({time.perf_counter()-t0:.0f}s)"
            ),
        )
        jax.block_until_ready(idx.graph.adj0)
        _ = int(np.asarray(idx.graph.count))
        build_s = time.perf_counter() - t0
        out["build_rows_per_s"] = round(N / build_s, 1)
        log(f"build: {build_s:.1f}s = {N/build_s:.0f} rows/s")
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        save_index(idx, cache)

    if os.environ.get("VSS_AB_LAYOUT") == "1":
        log("applying optimize_layout (cluster-ordered slots)...")
        t0 = time.perf_counter()
        idx.optimize_layout()
        log(f"optimize_layout: {time.perf_counter()-t0:.1f}s")
        out["layout"] = "clustered"

    graph, config = idx.graph, idx.config
    qs_all = queries
    if STORAGE == "int8":
        qs_all = qs_all / idx.vector_scale
    qs = jnp.asarray(qs_all.reshape(4, B, D))
    allow = graph.valid
    ps, pv = idx.pivots()
    xn = idx.norms()
    p_tab, p_pack = idx.packed_tape()
    log(f"pivots: {0 if ps is None else int(ps.shape[0])} slots")

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

    gt_d, gt_i = bruteforce_topk(qs[0], jnp.asarray(vecs / (idx.vector_scale if STORAGE == "int8" else 1.0)), K, "l2sq")
    gt = np.asarray(gt_i)

    def measure(expand, ef=EF, max_it=0, seeds=0, qstack=qs, label="",
                fused=False, rt=False):
        """seeds=0 -> greedy descent; seeds>0 -> pivot seeding; rt=True
        rescores the ef pool against the full-precision side tape."""
        nb_, B_ = qstack.shape[0], qstack.shape[1]
        p_s = ps if seeds else None
        p_v = pv if seeds else None
        ns = seeds or 4
        r_tape = idx.rerank_tape if rt else None

        # NB: r_tape must be a jit ARGUMENT — closure-captured device
        # arrays are embedded as HLO constants and the 512 MB tape blew
        # the remote-compile tunnel's request limit (HTTP 413)
        @partial(jax.jit, static_argnames=("iters",))
        def loop(graph, qstack, allow, rt, iters: int):
            def body(i, carry):
                acc, delta = carry
                q = qstack[i % nb_] + delta
                d, sl, it, ev = _hnsw_search_impl(
                    graph, config, q, allow, K, ef, expand, max_it, False,
                    True, fused, p_s, p_v, ns, xn,
                    p_tab if fused else None, p_pack if fused else 1,
                    rt,
                )
                s = d[0, 0]
                return acc + s, delta + s * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0), jnp.float32(0))
            )
            return acc

        per = slope(lambda it: loop(graph, qstack, allow, r_tape, it))
        qps = B_ / per
        d, sl, iters, evals = _hnsw_search_impl(
            graph, config, qstack[0], allow, K, ef, expand, max_it, False,
            True, fused, p_s, p_v, ns, xn,
            p_tab if fused else None, p_pack if fused else 1,
            r_tape,
        )
        rows = np.asarray(
            jnp.where(sl >= 0, jnp.take(graph.slot_to_rowid, jnp.maximum(sl, 0)), -1)
        )[: gt.shape[0]]
        hits = sum(
            len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
            for a, b in zip(rows, gt)
        )
        rec = hits / (min(rows.shape[0], gt.shape[0]) * K)
        key = label or (
            f"{'pv' + str(ns) if seeds else 'desc'}_E{expand}_ef{ef}"
            + (f"_mi{max_it}" if max_it else "") + f"_B{B_}"
            + ("_fused" if fused else "") + ("_rr" if rt else "")
        )
        out[f"{key}_qps"] = round(qps, 1)
        out[f"{key}_recall"] = round(rec, 4)
        log(f"{key}: {per*1e3:.2f}ms/batch -> {qps:.0f} qps, "
            f"recall@10={rec:.4f}, iters={int(iters)}, evals={int(evals)}")
        return qps, rec

    best = (0.0, None)
    VARIANT_SETS = {
        "r1": [
            dict(expand=2, seeds=0),            # round-1 baseline
            dict(expand=2, seeds=4),
            dict(expand=2, seeds=4, ef=32),
            dict(expand=2, seeds=4, ef=48),
            dict(expand=2, seeds=4, ef=32, max_it=24),
            dict(expand=2, seeds=4, ef=48, max_it=32),
            dict(expand=4, seeds=4, ef=32),
            dict(expand=1, seeds=4, ef=32),
            dict(expand=1, seeds=4, ef=24, max_it=32),
        ],
        # round-2 focus: the proven best +- the fused gather kernel
        "r2": [
            dict(expand=2, seeds=4, ef=48, max_it=32),
            dict(expand=2, seeds=4, ef=48, max_it=32, fused=True),
            dict(expand=2, seeds=4, ef=64),
            dict(expand=2, seeds=4, ef=64, fused=True),
        ],
        # exact-rescore side tape: recall recovered per ef at +-rerank
        # (int8 storage; run with VSS_AB_STORAGE=int8)
        "rr": [
            dict(expand=2, seeds=4, ef=32),
            dict(expand=2, seeds=4, ef=32, rt=True),
            dict(expand=2, seeds=4, ef=48),
            dict(expand=2, seeds=4, ef=48, rt=True),
            dict(expand=2, seeds=4, ef=64),
            dict(expand=2, seeds=4, ef=64, rt=True),
            dict(expand=2, seeds=4, ef=96, rt=True),
        ],
    }
    variants = VARIANT_SETS[os.environ.get("VSS_AB_SET", "r2")]
    for v in variants:
        try:
            qps, rec = measure(**v)
            if rec >= 0.95 and qps > best[0]:
                best = (qps, v)
        except Exception as e:
            log(f"variant {v} FAILED: {type(e).__name__}: {e}")

    # --- per-iteration decomposition on the best variant
    if best[1]:
        v = dict(best[1])
        try:
            base_mi = v.pop("max_it", 0) or 40
            lo_v = dict(v, max_it=8)
            hi_v = dict(v, max_it=base_mi)

            def per_of(var):
                nb_, B_ = qs.shape[0], qs.shape[1]
                p_s = ps if var.get("seeds") else None
                p_v = pv if var.get("seeds") else None
                ns = var.get("seeds") or 4
                ef = var.get("ef", EF)
                expand = var["expand"]
                max_it = var.get("max_it", 0)

                @partial(jax.jit, static_argnames=("iters",))
                def loop(graph, qstack, allow, iters: int):
                    def body(i, carry):
                        acc, delta = carry
                        d, sl, it, ev = _hnsw_search_impl(
                            graph, config, qstack[i % nb_] + delta, allow,
                            K, ef, expand, max_it, False, True, False,
                            p_s, p_v, ns, xn,
                        )
                        s = d[0, 0]
                        return acc + s, delta + s * 1e-30

                    acc, _ = jax.lax.fori_loop(
                        0, iters, body, (jnp.float32(0), jnp.float32(0))
                    )
                    return acc

                return slope(lambda it: loop(graph, qs, allow, it))

            per_lo, per_hi = per_of(lo_v), per_of(hi_v)
            per_iter = (per_hi - per_lo) / (base_mi - 8)
            out["per_beam_iter_ms"] = round(per_iter * 1e3, 3)
            out["seed_plus_fixed_ms"] = round((per_lo - 8 * per_iter) * 1e3, 3)
            log(f"decomposition: {per_iter*1e3:.3f}ms/beam-iter, "
                f"{(per_lo - 8*per_iter)*1e3:.2f}ms seed+fixed")
        except Exception as e:
            log(f"decomposition FAILED: {e}")

        # --- batch scaling on the best variant
        for shape in ((2, 2 * B), (8, B // 2)):
            try:
                q2 = jnp.asarray(
                    qs_all.reshape(*shape, D)
                )
                measure(**best[1], qstack=q2)
            except Exception as e:
                log(f"batch variant {shape} FAILED: {e}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
