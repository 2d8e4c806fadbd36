"""Beam-search A/B on a SAVED index: load, measure one config, exit.

Decouples the expensive 1M build (~4 min on chip) from search sweeps:
build once with VSS_AB_BUILD=1, then run one fresh process per config
(the axon relay degrades long-lived processes, so one-number-per-process
is the only trustworthy protocol — see bench.py).

Env knobs:
  VSS_AB_PATH     index file (default /tmp/ab_index.vss)
  VSS_AB_BUILD    1 = (re)build + save, then exit
  VSS_AB_N/D      corpus (build only; default 1M x 128)
  VSS_AB_STORAGE  f32|bf16|int8 (build only)
  VSS_AB_EF       ef_search (default 32)
  VSS_AB_EXPAND   beam expansion (default 2)
  VSS_AB_SEEDS    pivot seeds (default 4)
  VSS_AB_FUSED    1/0 (default auto)
  VSS_GATHER_NSEM / VSS_GATHER_QB  fused-kernel DMA knobs (ops/gather.py)

Prints one JSON line with qps + recall.
"""
import json
import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/bench_beam_load.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.devices()
    log("[ab] claimed")
    import jax.numpy as jnp
    from functools import partial

    from vss_tpu.index import HNSWConfig
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.index.search import _default_fused, _hnsw_search_impl
    from vss_tpu.ops import bruteforce_topk
    from vss_tpu.storage.serialize import load_index, save_index

    PATH = os.environ.get("VSS_AB_PATH", "/tmp/ab_index.vss")
    N = int(os.environ.get("VSS_AB_N", 1_000_000))
    D = int(os.environ.get("VSS_AB_D", 128))
    K = 10
    QB = 512

    rng = np.random.default_rng(0)
    n_centers = max(64, N // 2000)
    centers = rng.uniform(0, 255, (n_centers, D))

    def gen(n, seed):
        r = np.random.default_rng(seed)
        return np.clip(
            centers[r.integers(0, n_centers, n)] + r.normal(0, 25, (n, D)),
            0, 255,
        ).astype(np.float32)

    if os.environ.get("VSS_AB_BUILD") == "1":
        vecs = gen(N, 1)
        cfg = HNSWConfig(
            dims=D, storage_dtype=os.environ.get("VSS_AB_STORAGE", "f32")
        )
        t0 = time.perf_counter()
        idx = HNSWIndex.build(vecs, cfg, method="exact")
        _ = int(np.asarray(idx.graph.count))
        log(f"[ab] built in {time.perf_counter() - t0:.0f}s")
        if os.environ.get("VSS_AB_LAYOUT") == "1":
            t0 = time.perf_counter()
            idx.optimize_layout()
            _ = int(np.asarray(idx.graph.count))
            log(f"[ab] optimize_layout in {time.perf_counter() - t0:.0f}s")
        save_index(idx, PATH)
        # ground truth for 512 queries, reused by every sweep run
        q = gen(QB, 2)
        _, gt = bruteforce_topk(jnp.asarray(q), jnp.asarray(vecs), K, cfg.metric)
        np.savez(PATH + ".gt.npz", q=q, gt=np.asarray(gt))
        print(json.dumps({"built": N, "path": PATH}))
        return

    EF = int(os.environ.get("VSS_AB_EF", 32))
    EXPAND = int(os.environ.get("VSS_AB_EXPAND", 2))
    SEEDS = int(os.environ.get("VSS_AB_SEEDS", 4))
    idx = load_index(PATH)
    data = np.load(PATH + ".gt.npz")
    q, gt = data["q"], data["gt"]
    graph, config = idx.graph, idx.config
    fused_env = os.environ.get("VSS_AB_FUSED")
    fused = (fused_env == "1") if fused_env is not None else _default_fused(graph)
    p_s, p_v = idx.pivots() if SEEDS > 0 else (None, None)
    xn = idx.norms()
    p_tab, p_pack = idx.packed_tape()
    if fused and graph.vectors.dtype != jnp.float32 and p_tab is None:
        fused = False
    scale = idx.vector_scale
    qj = jnp.asarray(q / scale if config.storage_dtype == "int8" else q)

    @partial(jax.jit, static_argnames=("iters",))
    def loop(graph, qj, allow, iters: int):
        def body(i, carry):
            acc, delta = carry
            d, sl, it, ev = _hnsw_search_impl(
                graph, config, qj + delta, allow, K, EF, EXPAND, 0, False,
                True, fused, p_s, p_v, SEEDS, xn, p_tab, p_pack,
            )
            s = d[0, 0]
            return acc + s, delta + s * 1e-30

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), jnp.float32(0))
        )[0]

    allow = graph.valid

    def run(it):
        return float(np.asarray(loop(graph, qj, allow, it)).ravel()[0])

    _ = run(2); _ = run(8)
    deltas = []
    for _t in range(3):
        t0 = time.perf_counter(); _ = run(2); a = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = run(8); b = time.perf_counter() - t0
        deltas.append(b - a)
    pos = [d for d in deltas if d > 0]
    per = (min(pos) if pos else max(deltas)) / 6
    d, sl, iters, evals = _hnsw_search_impl(
        graph, config, qj, allow, K, EF, EXPAND, 0, False, True, fused,
        p_s, p_v, SEEDS, xn, p_tab, p_pack,
    )
    rows = np.asarray(
        jnp.where(sl >= 0, jnp.take(graph.slot_to_rowid, jnp.maximum(sl, 0)), -1)
    )
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(rows, gt)
    )
    out = {
        "qps": round(QB / per, 1),
        "recall": round(hits / gt.size, 4),
        "ef": EF, "expand": EXPAND, "seeds": SEEDS, "fused": bool(fused),
        "storage": config.storage_dtype,
        "nsem": os.environ.get("VSS_GATHER_NSEM", "32"),
        "gqb": os.environ.get("VSS_GATHER_QB", "8"),
        "iters": int(iters), "evals": int(evals),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
