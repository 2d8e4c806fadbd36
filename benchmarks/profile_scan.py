"""Phase-level profile of the exact-scan serving kernel (round 4).

The flagship scan-serve runs at ~47.6k qps = 11.9 GB/s effective over
the int8 tape — 69x off the 819 GB/s stream peak, so the kernel is NOT
bandwidth-bound. This script times phase A (segmin winnow) and the full
scan separately, across q-block sizes, to locate the gap:

    phase A  : pallas segmin kernel + segment top-keep selection
    phase B+C: segment-block gather + rescore + f32 rerank (the
               difference full - A)

Run on the real chip:  python benchmarks/profile_scan.py
Env: N (default 1M), D (128), K (10), QB list via QBS="256,512".
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 1_000_000))
D = int(os.environ.get("D", 128))
K = int(os.environ.get("K", 10))
B = int(os.environ.get("B", 512))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import threading

ok = threading.Event()


def _wd():
    if not ok.wait(150):
        print("[pscan] claim wedged; exit 42", file=sys.stderr, flush=True)
        os._exit(42)


threading.Thread(target=_wd, daemon=True).start()
_ = jax.devices()
ok.set()

import functools

import jax.numpy as jnp

from vss_tpu.ops.scan import (
    _native_segmin_scan,
    _native_tile,
    scan_topk,
)
from vss_tpu.utils import pad_to, round_up

rng = np.random.default_rng(0)
vecs = rng.integers(-120, 120, (N, D)).astype(np.int8)
tape = jnp.asarray(vecs)
xf = tape.astype(jnp.float32)
xn = jnp.sum(xf * xf, axis=1)
rr = xf  # f32 side tape
queries = jnp.asarray(
    rng.integers(-120, 120, (B, D)).astype(np.float32)
)
valid = jnp.ones((N,), jnp.bool_)


import functools as _ft


def slope_time(make_loop, lo=2, hi=8, trials=3):
    """bench.py's slope methodology: a jitted chained fori_loop (each
    iteration's input depends on the previous output, so nothing elides
    or memoizes), timed at two iteration counts; per-iter = d(t)/d(N).
    Naive repeat-timing of identical calls measured 936 GB/s 'streams'
    (above HBM peak) — pure memoization artifacts."""
    fn = make_loop
    _ = float(np.asarray(fn(lo)).ravel()[0])
    _ = float(np.asarray(fn(hi)).ravel()[0])
    deltas = []
    for _t in range(trials):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(lo)).ravel()[0])
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(hi)).ravel()[0])
        t_hi = time.perf_counter() - t0
        deltas.append(t_hi - t_lo)
    pos = [d for d in deltas if d > 0]
    if not pos:
        return max(max(deltas) / (hi - lo), 1e-9)
    return min(pos) / (hi - lo)


for qb in [int(x) for x in os.environ.get("QBS", "256,512").split(",")]:
    os.environ["VSS_SCAN_QB"] = str(qb)
    itemsize = 1
    tile = _native_tile(N, D, qb, itemsize)
    subt = max(1, tile // 512)
    xp = pad_to(tape, 0, tile)
    vp = pad_to(valid, 0, tile, value=False)
    v2 = vp.astype(jnp.int32)[None, :]
    xn2 = pad_to(xn, 0, tile)[None, :]
    qp = pad_to(queries, 0, qb)
    keep = max(2 * K, K + 6)

    import functools as _f

    @_f.partial(jax.jit, static_argnames=("iters",))
    def loopA(qp_, xp_, xn2_, v2_, iters: int):
        def body(i, carry):
            acc, delta = carry
            segs = _native_segmin_scan(
                (qp_ + delta).astype(jnp.bfloat16), xp_, xn2_, v2_, keep,
                "l2sq", tile, qb, subt,
            )
            s = jnp.asarray(segs[0, 0], jnp.float32)
            return acc + s, delta + s * 1e-30

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), jnp.float32(0))
        )[0]

    @_f.partial(jax.jit, static_argnames=("iters", "use_rr"))
    def loopF(q_, tape_, xn_, v_, rr_, iters: int, use_rr: bool):
        def body(i, carry):
            acc, delta = carry
            d, _ = scan_topk(
                q_ + delta, tape_, K, "l2sq", valid_mask=v_, x_norms=xn_,
                rerank_tape=rr_ if use_rr else None,
            )
            s = d[0, 0]
            return acc + s, delta + s * 1e-30

        return jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), jnp.float32(0))
        )[0]

    tA = slope_time(lambda it: loopA(qp, xp, xn2, v2, it))
    t_full = slope_time(
        lambda it: loopF(queries, tape, xn, valid, rr, it, True)
    )
    t_norr = slope_time(
        lambda it: loopF(queries, tape, xn, valid, rr, it, False)
    )
    gb = N * D * itemsize / 1e9
    print(
        f"[pscan] qb={qb} tile={tile} keep={keep}: "
        f"A={tA*1e3:.2f}ms ({gb/tA:.0f} GB/s) "
        f"full={t_full*1e3:.2f}ms ({B/t_full:.0f} qps) "
        f"full-no-rerank={t_norr*1e3:.2f}ms "
        f"B+C={(t_full-tA)*1e3:.2f}ms",
        file=sys.stderr, flush=True,
    )
print("[pscan] done", file=sys.stderr, flush=True)
