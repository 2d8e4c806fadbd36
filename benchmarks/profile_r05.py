"""Round-5 chip profile: scan-kernel phase split, SQL-path overhead,
relay upload bandwidth. All device data generated ON DEVICE (uploads
through the relay run ~13 MB/s and would dominate the session).

Run: timeout 1200 python benchmarks/profile_r05.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import _slope  # same slope-timed methodology

    log(f"backend={jax.default_backend()}")

    N, D, QB, K = 1_000_000, 128, 512, 10
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)

    # int8 tape + f32 norms + f32 rerank tape, all device-generated
    xf = jax.random.normal(kx, (N, D), jnp.float32) * 40.0
    tape = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    rr = tape.astype(jnp.float32)
    xn = jnp.sum(rr * rr, axis=1)
    q = jax.random.normal(kq, (QB, D), jnp.float32) * 40.0
    valid = jnp.ones((N,), jnp.bool_)
    jax.block_until_ready(tape)
    log("fixture resident")

    # ---- 0. upload bandwidth probe (for GIST-1M planning)
    host = np.random.default_rng(0).standard_normal((64, 1 << 20)).astype(np.float32)  # 256 MB
    t0 = time.perf_counter()
    dev = jnp.asarray(host)
    jax.block_until_ready(dev)
    up_s = time.perf_counter() - t0
    log(f"upload 256 MB: {up_s:.1f}s = {256 / up_s:.1f} MB/s")
    del dev, host

    from vss_tpu.ops.scan import (
        _native_segmin_scan, _native_tile, _rescore_native, scan_topk,
        _SEG,
    )
    from vss_tpu.utils import pad_to, round_up

    # ---- 1. end-to-end scan_topk slope (keep default = k+2)
    @partial(jax.jit, static_argnames=("iters",))
    def e2e(q, tape, xn, valid, rr, iters: int):
        def body(i, carry):
            acc, delta = carry
            d, _ = scan_topk(q + delta, tape, K, "l2sq", valid_mask=valid,
                             x_norms=xn, rerank_tape=rr)
            s = d[0, 0]
            return acc + s, delta + s * 1e-30
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0), jnp.float32(0)))[0]

    per = _slope(lambda it: e2e(q, tape, xn, valid, rr, it), 2, 8)
    log(f"[1] scan_topk e2e: {per*1e3:.2f} ms/batch = {QB/per:.0f} qps")

    # ---- 2. phase A alone (segmin pallas + keep-selection)
    qb = 256
    itemsize = 1
    d_pad = round_up(D, 128)
    tile = _native_tile(N, d_pad, qb, itemsize)
    subt = max(1, tile // 512)
    xp = pad_to(pad_to(tape, 1, 128), 0, tile)
    vp = pad_to(valid, 0, tile, value=False)
    v2 = vp.astype(jnp.int32)[None, :]
    xn2 = pad_to(xn, 0, tile)[None, :]
    qp = pad_to(q, 0, qb).astype(jnp.bfloat16)
    keep = K + 2

    @partial(jax.jit, static_argnames=("iters",))
    def phase_a(qp, xp, xn2, v2, iters: int):
        def body(i, carry):
            acc, delta = carry
            segs = _native_segmin_scan(
                qp + delta.astype(jnp.bfloat16), xp, xn2, v2, keep, "l2sq",
                tile, qb, subt,
            )
            s = segs[0, 0].astype(jnp.float32)
            return acc + s, delta + s * 1e-30
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0), jnp.float32(0)))[0]

    per_a = _slope(lambda it: phase_a(qp, xp, xn2, v2, it), 2, 8)
    log(f"[2] phase A (segmin+select, qb={qb}, x2 for 512): "
        f"{per_a*1e3:.2f} ms/256-batch -> {2*per_a*1e3:.2f} ms/512")

    # ---- 3. phases B+C alone (fixed segs)
    segs = _native_segmin_scan(qp, xp, xn2, v2, keep, "l2sq", tile, qb, subt)
    qf = pad_to(q, 0, qb).astype(jnp.float32)
    rr_p = pad_to(rr, 0, tile)
    m = min(max(2 * K, K + 6), keep * _SEG)

    @partial(jax.jit, static_argnames=("iters",))
    def phase_bc(qf, segs, xp, xn2, vp, rr_p, iters: int):
        def body(i, carry):
            acc, delta = carry
            dd, _ = _rescore_native(qf + delta, segs, xp, xn2[0], vp, rr_p,
                                    m, K, "l2sq", True)
            s = dd[0, 0]
            return acc + s, delta + s * 1e-30
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0), jnp.float32(0)))[0]

    per_bc = _slope(lambda it: phase_bc(qf, segs, xp, xn2, vp, rr_p, it), 2, 8)
    log(f"[3] phase B+C (qb={qb}, x2 for 512): {per_bc*1e3:.2f} ms/256 "
        f"-> {2*per_bc*1e3:.2f} ms/512")

    # ---- 4. SQL-path wall-clock breakdown at 200k
    from vss_tpu.index import HNSWConfig
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.query.api import col
    from vss_tpu.query.table import Database, IndexEntry

    N2 = 200_000
    rng = np.random.default_rng(1)
    nc = 128
    C = rng.uniform(0, 255, (nc, D))
    vecs = np.clip(C[rng.integers(0, nc, N2)] + rng.normal(0, 25, (N2, D)),
                   0, 255).astype(np.float32)
    qs_np = np.clip(C[rng.integers(0, nc, QB)] + rng.normal(0, 25, (QB, D)),
                    0, 255).astype(np.float32)
    cfg = HNSWConfig(dims=D, metric="l2sq", storage_dtype="int8",
                     rerank="auto")
    t0 = time.perf_counter()
    idx = HNSWIndex.build(vecs, cfg)
    jax.block_until_ready(idx.graph.count)
    log(f"[4] 200k build: {time.perf_counter()-t0:.1f}s")

    # raw eager scan_search wall-clock (what the SQL operator calls)
    _ = idx.scan_search(qs_np, K)
    for trial in range(3):
        t0 = time.perf_counter()
        d_, r_ = idx.scan_search(qs_np, K)
        r_ = np.asarray(r_)
        log(f"[4] eager scan_search wall: {(time.perf_counter()-t0)*1e3:.1f} ms")

    # scan_search with the query already on device
    q_dev = jnp.asarray(qs_np)
    jax.block_until_ready(q_dev)
    for trial in range(3):
        t0 = time.perf_counter()
        d_, r_ = idx.scan_search(q_dev, K)
        r_ = np.asarray(r_)
        log(f"[4] eager scan_search (device q): {(time.perf_counter()-t0)*1e3:.1f} ms")

    db = Database()
    db.create_table("corpus", {"id": np.arange(N2, dtype=np.int64),
                               "vec": vecs})
    db.indexes["bench_idx"] = IndexEntry(name="bench_idx", table="corpus",
                                         column="vec", index=idx)
    db.create_table("qs", {"qid": np.arange(QB, dtype=np.int64),
                           "vec": qs_np})
    db.set_setting("hnsw_cost_model", True)
    qj = (db.query("qs").knn_join("corpus", "vec", col("vec"), K)
          .select("row_number", qid=col("l_qid"), rid=col("r_id")))
    log(f"[4] plan: {qj.explain().splitlines()[0]}")
    _ = qj.execute()
    for trial in range(3):
        t0 = time.perf_counter()
        _ = qj.execute()
        log(f"[4] qj.execute wall: {(time.perf_counter()-t0)*1e3:.1f} ms")

    # breakdown via explain_analyze
    from vss_tpu.query.exec import explain_analyze
    from vss_tpu.query.rewrite import optimize

    plan = optimize(db, qj.plan())
    t0 = time.perf_counter()
    rep, _ = explain_analyze(db, plan)
    log(f"[4] explain_analyze total {(time.perf_counter()-t0)*1e3:.1f} ms:\n{rep}")

    # plan/rewrite cost alone
    t0 = time.perf_counter()
    for _ in range(10):
        plan = optimize(db, qj.plan())
    log(f"[4] optimize(plan) x10: {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
