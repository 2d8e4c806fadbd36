"""Round-2 performance-model microbenchmarks, measured IN-GRAPH.

The axon relay adds ~2-30ms of per-dispatch overhead and dedupes repeated
identical dispatches, so anything timed dispatch-by-dispatch is garbage.
Everything here runs a fori_loop of N iterations inside ONE jitted
computation with a data dependency chain, timed at two iteration counts;
the slope is the true per-iteration rate (the steady state the beam-search
while_loop actually sees).

Measures:
  1. random-row gather: XLA take vs Pallas DMA kernel (f32 / int8 rows)
  2. pairwise-distance precision ladder: DEFAULT(bf16) / HIGH(3x) /
     HIGHEST(6x) XLA, and the Pallas kernel — rate + numeric agreement
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

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    results = {}

    N, D = 1_000_000, 128
    # clustered byte-valued data: the l2sq-cancellation case
    centers = rng.uniform(0, 255, (512, D))
    x_np = np.clip(
        centers[rng.integers(0, 512, N)] + rng.normal(0, 25, (N, D)), 0, 255
    ).astype(np.float32)
    x = jnp.asarray(x_np)
    n_ids = 32768
    ids0 = jnp.asarray(rng.integers(0, N, n_ids), jnp.int32)

    def slope(fn, lo=2, hi=12):
        # warm BOTH iteration counts (each is its own XLA program — an
        # unwarmed hi run times the compiler, not the chip)
        _ = float(np.asarray(fn(lo)).ravel()[0])
        _ = float(np.asarray(fn(hi)).ravel()[0])
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(lo)).ravel()[0])
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(hi)).ravel()[0])
        t_hi = time.perf_counter() - t0
        return (t_hi - t_lo) / (hi - lo)

    # ---------------- 1. gathers (in-graph loops)
    from functools import partial

    from vss_tpu.ops.gather import _gather_rows_impl

    @partial(jax.jit, static_argnames=("iters",))
    def take_loop(tab, ids, iters: int):
        def body(j, carry):
            acc, ids = carry
            g = jnp.take(tab, ids, axis=0)
            s = g[:, 0].astype(jnp.float32).sum()
            # data-dependent next ids: can't be hoisted or overlapped away
            ids = (ids + 1 + (s > 1e30).astype(jnp.int32)) % N
            return acc + s, ids

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), ids))
        return acc

    @partial(jax.jit, static_argnames=("iters", "chunk"))
    def pallas_loop(tab, ids, iters: int, chunk: int):
        def body(j, carry):
            acc, ids = carry
            g = _gather_rows_impl(tab, ids, chunk, False)
            s = g[:, 0].astype(jnp.float32).sum()
            ids = (ids + 1 + (s > 1e30).astype(jnp.int32)) % N
            return acc + s, ids

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), ids))
        return acc

    tabs = {
        "f32": (x, 4 * D, True),
        "int8": ((x / 2).astype(jnp.int8), D, False),  # Mosaic: no 1-row
        # DMA slices from (32,128)-tiled int8 tables; packed-view gathers
        # are exercised separately (bench_search_ab)
    }
    for name, (tab, row_bytes, do_pallas) in tabs.items():
        per = slope(lambda it: take_loop(tab, ids0, it))
        rps = n_ids / per
        results[f"xla_take_{name}_Mrows_s"] = rps / 1e6
        log(f"XLA take {name}: {per*1e3:.2f}ms/iter, {rps/1e6:.1f}M rows/s, "
            f"{rps*row_bytes/1e9:.0f} GB/s")
        for chunk in (256, 512):
            if not do_pallas:
                continue
            try:
                per = slope(lambda it: pallas_loop(tab, ids0, it, chunk))
                rps = n_ids / per
                results[f"pallas_gather_{name}_c{chunk}_Mrows_s"] = rps / 1e6
                log(f"Pallas gather {name} chunk={chunk}: "
                    f"{per*1e3:.2f}ms/iter, {rps/1e6:.1f}M rows/s, "
                    f"{rps*row_bytes/1e9:.0f} GB/s")
            except Exception as e:
                log(f"Pallas gather {name} c{chunk} FAILED: {e}")

    # correctness
    from vss_tpu.ops.gather import gather_rows_pallas

    got = np.asarray(gather_rows_pallas(x, ids0[:1000]))
    want = x_np[np.asarray(ids0[:1000])]
    log(f"pallas gather max|diff| = {np.abs(got - want).max()}")

    # ---------------- 2. distance precision ladder (512 x 65536 slab)
    from vss_tpu.ops.distance import pairwise_pallas

    B, NX = 512, 65536
    q = jnp.asarray(x_np[:B] + 0.5)
    xs = x[:NX]

    def pw(prec):
        @jax.jit
        def f(q, xs):
            dots = jax.lax.dot_general(
                q, xs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            qn = jnp.sum(q * q, axis=-1, keepdims=True)
            xn = jnp.sum(xs * xs, axis=-1, keepdims=True).T
            return jnp.maximum(qn + xn - 2 * dots, 0.0)

        return f

    # float64 ground truth on host
    d64 = (
        np.sum(np.asarray(q, np.float64) ** 2, -1)[:, None]
        + np.sum(x_np[:NX].astype(np.float64) ** 2, -1)[None, :]
        - 2.0 * np.asarray(q, np.float64) @ x_np[:NX].astype(np.float64).T
    )
    gt10 = np.argsort(d64, axis=1, kind="stable")[:, :10]

    import jax.lax as lax

    fl = 2 * B * NX * D
    for prec_name, prec in (
        ("DEFAULT", lax.Precision.DEFAULT),
        ("HIGH", lax.Precision.HIGH),
        ("HIGHEST", lax.Precision.HIGHEST),
    ):
        f = pw(prec)
        d = np.asarray(f(q, xs))
        top = np.argsort(d, axis=1, kind="stable")[:, :10]
        churn = 1.0 - (
            np.asarray([
                len(set(a) & set(b)) for a, b in zip(top, gt10)
            ]).sum() / (B * 10)
        )

        @partial(jax.jit, static_argnames=("iters",))
        def loop(q, xs, iters: int, f=f):
            def body(j, carry):
                acc, qq = carry
                d = f(qq, xs)
                s = d[0, 0]
                qq = qq + (s * 1e-30)
                return acc + s, qq

            acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), q))
            return acc

        per = slope(lambda it: loop(q, xs, it))
        tf = fl / per / 1e12
        results[f"pw_{prec_name}_tflops"] = tf
        results[f"pw_{prec_name}_top10_err"] = churn
        log(f"pairwise {prec_name}: {per*1e3:.2f}ms -> {tf:.0f} TF/s, "
            f"top10 err vs f64 = {churn:.4f}")

    # pallas pairwise (claims HIGHEST)
    dp = np.asarray(pairwise_pallas(q, xs, "l2sq"))
    topp = np.argsort(dp, axis=1, kind="stable")[:, :10]
    churn = 1.0 - (
        np.asarray([len(set(a) & set(b)) for a, b in zip(topp, gt10)]).sum()
        / (B * 10)
    )

    @partial(jax.jit, static_argnames=("iters",))
    def loopp(q, xs, iters: int):
        def body(j, carry):
            acc, qq = carry
            d = pairwise_pallas(qq, xs, "l2sq")
            s = d[0, 0]
            return acc + s, qq + s * 1e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), q))
        return acc

    per = slope(lambda it: loopp(q, xs, it))
    tf = fl / per / 1e12
    results["pw_pallas_tflops"] = tf
    results["pw_pallas_top10_err"] = churn
    log(f"pairwise PALLAS: {per*1e3:.2f}ms -> {tf:.0f} TF/s, "
        f"top10 err vs f64 = {churn:.4f}")

    # ---------------- 3. exact scan, slope-timed in-graph
    from vss_tpu.ops.topk import bruteforce_topk

    qb = jnp.asarray(x_np[:512] + 0.25)

    @partial(jax.jit, static_argnames=("iters",))
    def scan_loop(q, iters: int):
        def body(j, carry):
            acc, qq = carry
            d, i = bruteforce_topk(qq, x, 10, "l2sq")
            s = d[0, 0]
            return acc + s, qq + s * 1e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), q))
        return acc

    per = slope(lambda it: scan_loop(qb, it), lo=2, hi=6)
    qps = 512 / per
    results["exact_scan_qps_true"] = qps
    log(f"exact scan (slope, in-graph): {per*1e3:.1f}ms/batch -> "
        f"{qps:.0f} qps, implies {2*512*N*D/per/1e12:.1f} TF/s")

    import json

    print(json.dumps({k: round(float(v), 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
