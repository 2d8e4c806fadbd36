"""On-chip microbenchmarks: matmul peak, exact-scan, gather bandwidth.

Establishes the round-2 performance model:
  1. MXU peak (bf16 and f32-HIGHEST matmul) -> MFU denominators
  2. exact-scan qps sanity check vs model FLOPs
  3. random-row gather: XLA take vs Pallas DMA kernel -> rows/s, GB/s

Run on the real chip:  python benchmarks/micro_gather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=5):
    """Time with per-iteration distinct operands: the relay dedupes
    repeated identical dispatches, so naive same-operand loops report
    impossible FLOP rates (the round-1 exact-scan artifact)."""
    import jax
    import jax.numpy as jnp

    r = fn(*args)
    jax.block_until_ready(r)  # compile + warm
    # make iters variants of the first arg differing by a cheap O(n) edit
    variants = [args[0] + jnp.float32(i + 1) if args[0].dtype != jnp.int32
                else args[0] for i in range(iters)]
    if args[0].dtype == jnp.int32:
        variants = [(args[0] + i) % max(int(args[0].max()), 2) for i in range(iters)]
    variants = [v.astype(args[0].dtype) for v in variants]
    jax.block_until_ready(variants)
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(variants[i], *args[1:]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def timeit_chained(fn, a, b, iters=8):
    """Time a matmul by chaining outputs into inputs — impossible to dedupe
    or overlap; gives a true sequential-execution rate."""
    import jax

    r = fn(a, b)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = a
    for _ in range(iters):
        r = fn(r, b)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()} device={jax.devices()}")
    rng = np.random.default_rng(0)

    results = {}

    # ---- 1. matmul peaks
    M = 4096
    a32 = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
    b32 = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
    abf = a32.astype(jnp.bfloat16)
    bbf = b32.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    @jax.jit
    def mm_f32_highest(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def mm_f32_default(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    fl = 2 * M**3
    t = timeit_chained(mm_bf16, abf, bbf)
    results["bf16_tflops"] = fl / t / 1e12
    log(f"bf16 matmul (chained): {results['bf16_tflops']:.1f} TF/s")
    t = timeit_chained(mm_f32_default, a32, b32)
    results["f32_default_tflops"] = fl / t / 1e12
    log(f"f32 default matmul (chained): {results['f32_default_tflops']:.1f} TF/s")
    t = timeit_chained(mm_f32_highest, a32, b32)
    results["f32_highest_tflops"] = fl / t / 1e12
    log(f"f32 HIGHEST matmul (chained): {results['f32_highest_tflops']:.1f} TF/s")

    # ---- 2. exact scan sanity (512 queries x 1M x 128)
    from vss_tpu.ops import bruteforce_topk

    N, D, B = 1_000_000, 128, 512
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t = timeit(lambda q: bruteforce_topk(q, x, 10, "l2sq"), q, iters=3)
    qps = B / t
    model_tflops = 2 * B * N * D / t / 1e12
    results["exact_scan_qps"] = qps
    results["exact_scan_model_tflops"] = model_tflops
    log(f"exact scan: {qps:.0f} qps -> implies {model_tflops:.1f} TF/s "
        f"(f32-HIGHEST peak measured {results['f32_highest_tflops']:.1f})")

    # ---- 3. gathers
    from vss_tpu.ops.gather import gather_rows_pallas

    n_ids = 32768
    ids = jnp.asarray(rng.integers(0, N, n_ids), jnp.int32)

    @jax.jit
    def take_xla(tab, ids):
        return jnp.take(tab, ids, axis=0)

    for name, tab, row_bytes in (
        ("f32_128d", x, 512),
        ("int8_128d", (x[:, :128] * 10).astype(jnp.int8), 128),
    ):
        # vary the (cheap) ids operand per iteration, not the table
        t = timeit(lambda i, tb=tab: take_xla(tb, i), ids)
        rps = n_ids / t
        results[f"xla_take_{name}_rows_per_s"] = rps
        log(f"XLA take {name}: {t*1e6:.0f}us, {rps/1e6:.1f}M rows/s, "
            f"{rps*row_bytes/1e9:.1f} GB/s")
        try:
            t = timeit(lambda i, tb=tab: gather_rows_pallas(tb, i), ids)
            rps = n_ids / t
            results[f"pallas_gather_{name}_rows_per_s"] = rps
            log(f"Pallas gather {name}: {t*1e6:.0f}us, {rps/1e6:.1f}M rows/s, "
                f"{rps*row_bytes/1e9:.1f} GB/s")
        except Exception as e:
            log(f"Pallas gather {name} FAILED: {type(e).__name__}: {e}")

    # correctness spot check
    got = np.asarray(gather_rows_pallas(x, ids[:1000]))
    want = np.asarray(jnp.take(x, ids[:1000], axis=0))
    log(f"pallas gather correctness: max|diff|={np.abs(got-want).max()}")

    # adjacency-width gather (32 x int32 rows = 128B)
    adj = jnp.asarray(rng.integers(0, N, (N, 32)), jnp.int32)
    t = timeit(lambda i: take_xla(adj, i), ids)
    log(f"XLA take adj32: {t*1e6:.0f}us, {n_ids/t/1e6:.1f}M rows/s")
    try:
        t = timeit(lambda i: gather_rows_pallas(adj, i), ids)
        log(f"Pallas gather adj32: {t*1e6:.0f}us, {n_ids/t/1e6:.1f}M rows/s")
        got = np.asarray(gather_rows_pallas(adj, ids[:1000]))
        want = np.asarray(jnp.take(adj, ids[:1000], axis=0))
        log(f"adj correctness: {np.array_equal(got, want)}")
    except Exception as e:
        log(f"Pallas adj gather FAILED: {type(e).__name__}: {e}")

    import json

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
