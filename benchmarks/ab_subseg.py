"""A/B: two-level (32-row) winnow scan vs the round-4 baseline numbers.

Round-4 baseline at 1M x 128 int8 keep=k+2: 8.58 ms/512-batch (59.7k
qps); phases B+C 7.05 ms of it. Run on chip:
  timeout 1200 python benchmarks/ab_subseg.py
"""
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import _slope
    from vss_tpu.ops.scan import scan_topk
    from vss_tpu.ops.topk import bruteforce_topk

    log(f"backend={jax.default_backend()}")
    N, D, QB, K = 1_000_000, 128, 512, 10
    key = jax.random.PRNGKey(0)
    kx, kq, kc = jax.random.split(key, 3)
    # clustered corpus (the flagship's distribution class) so recall is
    # measured against near-tie structure, not the easy iid case
    nc = 500
    C = jax.random.uniform(kc, (nc, D), jnp.float32, 0, 255)
    assign = jax.random.randint(kx, (N,), 0, nc)
    xf = jnp.clip(
        C[assign] + 25.0 * jax.random.normal(kx, (N, D), jnp.float32),
        0, 255,
    )
    qa = jax.random.randint(kq, (QB,), 0, nc)
    q = jnp.clip(
        C[qa] + 25.0 * jax.random.normal(kq, (QB, D), jnp.float32), 0, 255
    )
    scale = float(jnp.max(jnp.abs(xf))) / 127.0
    xs = xf / scale
    tape = jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)
    rr = xs.astype(jnp.float32)
    xn = jnp.sum(tape.astype(jnp.float32) ** 2, axis=1)
    qs = q / scale
    valid = jnp.ones((N,), jnp.bool_)
    jax.block_until_ready(tape)
    log("fixture resident")

    _, gt = bruteforce_topk(qs, xs, K, "l2sq")
    gt = np.asarray(gt)
    log("gt done")

    # phase A + selection alone (new two-level kernel)
    if os.environ.get("AB_PHASE_A", "1") == "1":
        from vss_tpu.ops.scan import _native_segmin_scan, _native_tile
        from vss_tpu.utils import pad_to, round_up

        qb = 256
        d_pad = round_up(D, 128)
        tile = _native_tile(N, d_pad, qb, 1)
        subt = max(1, tile // 1024)
        xp = pad_to(pad_to(tape, 1, 128), 0, tile)
        vp = pad_to(valid, 0, tile, value=False)
        v2 = vp.astype(jnp.int32)[:, None]
        xn2 = pad_to(xn, 0, tile)[:, None]
        qp = pad_to(qs, 0, qb).astype(jnp.bfloat16)

        @partial(jax.jit, static_argnames=("iters",))
        def phase_a(qp, xp, xn2, v2, iters: int):
            def body(i, carry):
                acc, delta = carry
                segs = _native_segmin_scan(
                    qp + delta.astype(jnp.bfloat16), xp, xn2, v2, K + 2,
                    "l2sq", tile, qb, subt,
                )
                s = segs[0, 0].astype(jnp.float32)
                return acc + s, delta + s * 1e-30
            return jax.lax.fori_loop(0, iters, body,
                                     (jnp.float32(0), jnp.float32(0)))[0]

        per_a = _slope(lambda it: phase_a(qp, xp, xn2, v2, it), 16, 64)
        log(f"[phaseA] {per_a*1e3:.2f} ms/256 -> {2*per_a*1e3:.2f} ms/512")

    for dt_name, tp, keep in (
        ("int8", tape, None), ("int8 keep=2k", tape, 2 * K),
        ("bf16", xs.astype(jnp.bfloat16), None),
    ):
        xn_t = (
            xn if tp.dtype == jnp.int8
            else jnp.sum(tp.astype(jnp.float32) ** 2, axis=1)
        )

        @partial(jax.jit, static_argnames=("iters",))
        def e2e(q, tp, xn_t, valid, rr, iters: int):
            def body(i, carry):
                acc, delta = carry
                d, _ = scan_topk(q + delta, tp, K, "l2sq",
                                 valid_mask=valid, x_norms=xn_t,
                                 rerank_tape=rr, keep=keep)
                s = d[0, 0]
                return acc + s, delta + s * 1e-30
            return jax.lax.fori_loop(0, iters, body,
                                     (jnp.float32(0), jnp.float32(0)))[0]

        per = _slope(lambda it: e2e(qs, tp, xn_t, valid, rr, it), 16, 64)
        _, ids = scan_topk(qs, tp, K, "l2sq", valid_mask=valid,
                           x_norms=xn_t, rerank_tape=rr, keep=keep)
        ids = np.asarray(ids)
        rec = sum(
            len(set(a[a >= 0].tolist()) & set(b.tolist()))
            for a, b in zip(ids, gt)
        ) / (QB * K)
        log(f"[{dt_name}] {per*1e3:.2f} ms/batch = {QB/per:.0f} qps "
            f"recall@{K}={rec:.5f}")


if __name__ == "__main__" and os.environ.get("AB_EAGER") != "1":
    main()


def eager_throughput():
    """Sustained serving throughput: N independent eager dispatches of
    DISTINCT query batches, one final block — exactly how a server
    drives the chip (async dispatch queue overlaps batches). The chained
    fori slope measures SERIAL latency instead; the two differ when the
    chunked winnow lets batch i+1's stream overlap batch i's tail."""
    import time

    import jax
    import jax.numpy as jnp

    from vss_tpu.index import HNSWConfig
    from vss_tpu.index.dense import HNSWIndex

    log(f"backend={jax.default_backend()}")
    N, D, QB, K = 1_000_000, 128, 512, 10
    key = jax.random.PRNGKey(0)
    kx, kq, kc = jax.random.split(key, 3)
    nc = 500
    C = jax.random.uniform(kc, (nc, D), jnp.float32, 0, 255)
    assign = jax.random.randint(kx, (N,), 0, nc)
    xf = np.asarray(jnp.clip(
        C[assign] + 25.0 * jax.random.normal(kx, (N, D), jnp.float32),
        0, 255,
    ))
    NB = 16
    qa = jax.random.randint(kq, (NB * QB,), 0, nc)
    qs_all = jnp.clip(
        C[qa] + 25.0 * jax.random.normal(kq, (NB * QB, D), jnp.float32),
        0, 255,
    ).reshape(NB, QB, D)
    cfg = HNSWConfig(dims=D, storage_dtype="int8", rerank="auto")
    t0 = time.perf_counter()
    idx = HNSWIndex.build(xf, cfg)
    jax.block_until_ready(idx.graph.count)
    log(f"build {time.perf_counter()-t0:.1f}s")
    # warm both all query blocks' shapes (same shape -> one compile)
    outs = [idx.scan_search(qs_all[i], K) for i in range(2)]
    jax.block_until_ready(outs[-1][0])
    for trial in range(3):
        t0 = time.perf_counter()
        outs = [idx.scan_search(qs_all[i], K) for i in range(NB)]
        jax.block_until_ready([o[0] for o in outs])
        dt = time.perf_counter() - t0
        log(f"[eager-pipelined] {NB} batches in {dt*1e3:.1f} ms = "
            f"{NB*QB/dt:.0f} qps ({dt/NB*1e3:.2f} ms/batch)")


if __name__ == "__main__" and os.environ.get("AB_EAGER") == "1":
    eager_throughput()
    sys.exit(0)
