"""Storage-native exact-scan: stream the tape in its stored dtype.

The round-2 exact scan (`ops/topk.bruteforce_topk`) converts the whole
table to f32 and runs the MXU at HIGHEST precision — correct for the
user-facing EXACT operator, but it streams 4x the bytes of an int8 tape
and runs the matmul an order of magnitude below the chip's bf16 rate.
This module is the ANN-grade fast path the flagship serves:

  phase A (winnow): one pass over the tape IN ITS STORED DTYPE. Tiles
    decode to bf16 in VMEM (int8 -> bf16 is exact: 8 mantissa bits cover
    +-127) and the MXU runs at DEFAULT precision. The distance proxy
    drops the query-norm term entirely — it is constant per query, so
    per-query ordering is unchanged — and takes row norms from a
    precomputed f32 tape instead of recomputing them per tile. The tile
    reduces to per-32-row SUB-segment minima written straight to HBM
    (the provably-exact winnowing argument lives in ops/topk.py).
  selection (two-level, round 5): 128-row SUPER-segment minima (a
    reshape-min over the sub minima) select the `keep` best supers —
    the exact bound applies at any granularity: at most k segments can
    contain a true top-k row, so top-(k+margin) supers by min capture
    them all. The selected supers' 4 sub-minima each (keep*4 values per
    query) then select the `keep` best SUB-segments by the same bound.
    Two cheap selections instead of one, and phase B shrinks 4x.
  phase B (sub-segment rescore): gather the `keep` best sub-segments'
    rows (consecutive 32-row blocks — 4 KB DMA descriptors at d=128
    int8) from the STORED tape, decode, and score. Round-4 profiled
    phases B+C at 7.1 of the 8.6 ms batch with 128-row segments; the
    32-row restructure rescans a quarter of the rows.
  phase C (exact rerank): gather the top ~2k candidate rows from the f32
    side tape (`rerank_tape`, held in scaled units by the int8 config)
    and rescore at full precision; the final top-k ordering is exact
    with respect to the f32 data whenever phases A/B kept the true
    winners (measured recall ~1.0; bench reports it).

Replaces the role of `search_exact_`
(/root/reference/src/include/usearch/index.hpp:4004-4025) at serving
time; `bruteforce_topk` remains the bit-exact oracle path.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vss_tpu.ops.distance import Metric, _epilogue
from vss_tpu.ops.topk import _ITER_K_MAX, _SEG, _iter_min_k
from vss_tpu.utils import pad_to, round_up

__all__ = ["scan_topk", "native_scan_supported", "SCAN_K_MAX"]

_INF = float("inf")

# sub-segment granularity of the two-level winnow: 32 rows keeps the
# phase-B gather at >= 4 KB descriptors (32 x 128 int8) while rescoring
# a quarter of the rows a 128-row segment did; _SEG (128) remains the
# super-segment / selection-bound granularity
_SUBSEG = 32
_GROUP = _SEG // _SUBSEG

# widest k the native path serves. Above _ITER_K_MAX (32) the selection
# steps fall back from the iterative min-k to lax.top_k (already wired
# in _native_segmin_scan / _rescore_native_block); the phase-B rescore
# block scales as keep = max(2k, k+6) segments and stays VMEM-bounded by
# the per-chunk query limit. 128 covers the bulk builder's candidate
# lists up to m0 = 96 (the iid arm's m=48 build); the serving path
# keeps using small k where the kernel is fastest.
SCAN_K_MAX = 128


def native_scan_supported(dtype) -> bool:
    return dtype in (jnp.int8, jnp.bfloat16, jnp.float32)


def _native_segmin_kernel(
    q_ref, x_ref, xn_ref, v_ref, out_ref, *, metric_name: str, subt: int
):
    """Per-tile distance-proxy sub-seg-min. q [qb, d] bf16; x [tile, d]
    stored dtype; xn [tile, 1] f32 row norms (of the STORED values);
    v [tile, 1] i32 validity. Writes [tile/_SUBSEG, qb]: row i = min
    distance of sub-segment i (32 consecutive tape rows) to each query.

    The dots come out TRANSPOSED ([rows, queries]) so tape rows sit on
    the SUBLANE axis, where a reshape by 32 is legal — Mosaic cannot
    split the 128-wide lane axis, which sank three other shapes of this
    kernel (lane reshape: unsupported; masked per-32 lane minima:
    ~214 MB register spill unrolled, serialized pipeline rolled, 113 MB
    scoped-vmem output with a 3-D block). One reduction, one aligned
    32-sublane store per 1024-row subtile, no in-kernel transposes."""
    metric = Metric.parse(metric_name)
    q = q_ref[:]
    tile = x_ref.shape[0]
    sub = tile // subt
    nsub = sub // _SUBSEG

    # fully unrolled (the round-4 proven structure, now transpose-free):
    # a rolled lax.fori_loop serialized the MXU/VPU pipeline (phase A
    # 3.7 -> 8.3 ms/512). The unrolled form's scoped-vmem output
    # allocation is safe here because the CALLER chunks the corpus so
    # the output stays well under the 16 MB cap.
    def one(s):
        x = x_ref[pl.ds(s * sub, sub), :].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            x, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [sub, qb] f32 — rows on sublanes
        ok = v_ref[pl.ds(s * sub, sub), :] > 0  # [sub, 1]
        if metric == Metric.IP:
            d = -dots
        elif metric == Metric.L2SQ:
            # qn dropped: constant per query, ordering-invariant
            d = xn_ref[pl.ds(s * sub, sub), :] - 2.0 * dots
        else:  # cosine: order by -cos; zero-x rows order like cos == 0
            xn = xn_ref[pl.ds(s * sub, sub), :]
            d = jnp.where(xn > 0.0, -dots * jax.lax.rsqrt(jnp.maximum(xn, 1e-30)), 0.0)
        d = jnp.where(ok, d, _INF)
        return jnp.min(d.reshape(nsub, _SUBSEG, d.shape[1]), axis=1)

    out_ref[:] = jnp.concatenate([one(s) for s in range(subt)], axis=0)


def _select_min_k(vals, k):
    """(vals, positions) of the k smallest along the last axis."""
    if k <= _ITER_K_MAX:
        return _iter_min_k(vals, k)
    nt = jax.lax.top_k(-vals, k)
    return -nt[0], nt[1]


@functools.partial(
    jax.jit, static_argnames=("keep", "metric_name", "tile", "qb", "subt")
)
def _native_segmin_scan(q, x, xn2, v2, keep, metric_name, tile, qb, subt):
    """Phase A + two-level selection. Returns [nq, keep] SUB-segment ids
    (-1 pad): top-`keep` supers by min (exact winnow bound), then
    top-`keep` subs among the selected supers' sub-minima (same bound
    one level down — a sub-segment holding a true top-k row has min
    <= d_k, so its super does too and survives the first cut)."""
    nq, d = q.shape
    nxp = x.shape[0]
    S = tile // _SUBSEG

    # The corpus axis is CHUNKED so each kernel call's output stays
    # under XLA:TPU's ~16 MB scoped-vmem cap: the sub-segment output is
    # 4x the r4 per-128 one, and every single-call variant tried (2-D /
    # 3-D blocks, unrolled / rolled / hand-unrolled stores) had the full
    # 64 MB buffer stack-allocated in scoped vmem and OOM'd the compile.
    # Per-chunk outputs of <= 8 MB allocate fine; lax.map keeps them in
    # one HBM result.
    # 6 MB per-chunk output target: 8 MB left a fused consumer 376 KB
    # over the cap on the bf16 shape
    ch = max(tile, ((6 << 20) * _SUBSEG // 4 // max(nq, 1)) // tile * tile)
    # never pad past the corpus itself (a small nq makes the cap-derived
    # chunk huge; one whole-corpus chunk is then already under the cap)
    ch = min(ch, round_up(nxp, tile))
    nxp2 = round_up(nxp, ch)
    if nxp2 != nxp:
        x = pad_to(x, 0, ch)
        xn2 = pad_to(xn2, 0, ch)
        v2 = pad_to(v2, 0, ch)  # pad rows invalid -> INF minima
    C = nxp2 // ch
    grid = (nq // qb, ch // tile)

    def one_chunk(args):
        xc, xnc, vc = args
        return pl.pallas_call(
            functools.partial(
                _native_segmin_kernel, metric_name=metric_name, subt=subt
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((qb, d), lambda i, j: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
                pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((S, qb), lambda i, j: (j, i)),
            out_shape=jax.ShapeDtypeStruct((ch // _SUBSEG, nq), jnp.float32),
        )(q, xc, xnc, vc)

    subs = jax.lax.map(
        one_chunk,
        (
            x.reshape(C, ch, d),
            xn2.reshape(C, ch, 1),
            v2.reshape(C, ch, 1),
        ),
    )  # [C, ch/32, nq]
    submins = subs.reshape(-1, nq)
    submins = submins.T  # [nq, NS_sub]; sub id i covers rows [32i, 32i+32)
    ns_sub = submins.shape[1]
    supermins = jnp.min(
        submins.reshape(nq, ns_sub // _GROUP, _GROUP), axis=2
    )
    sd, si = _select_min_k(supermins, min(keep, ns_sub // _GROUP))
    # the selected supers' sub minima: keep*_GROUP candidates per query
    sub_idx = (
        jnp.maximum(si, 0)[:, :, None] * _GROUP
        + jnp.arange(_GROUP, dtype=si.dtype)[None, None, :]
    ).reshape(nq, -1)
    sub_vals = jnp.take_along_axis(submins, sub_idx, axis=1)
    sub_vals = jnp.where(
        jnp.repeat(jnp.isfinite(sd), _GROUP, axis=1), sub_vals, _INF
    )
    ssd, ssp = _select_min_k(sub_vals, min(keep, sub_vals.shape[1]))
    sub_global = jnp.take_along_axis(sub_idx, ssp, axis=1)
    return jnp.where(jnp.isfinite(ssd), sub_global, -1)


@functools.partial(
    jax.jit, static_argnames=("m", "metric_name", "has_rerank", "k")
)
def _rescore_native(q, segs, x, xn_tape, valid, rerank_tape, m, k,
                    metric_name, has_rerank):
    """Phases B+C, chunked over queries so the gathered candidate block
    stays a few hundred MB at worst (keep*32 rows per query)."""
    nq = q.shape[0]
    keep = segs.shape[1]
    limit = max(8, (1 << 26) // max(keep * _SUBSEG * q.shape[1], 1))
    cq = min(nq, 1 << (limit.bit_length() - 1))
    if nq > cq and nq % cq == 0:
        qs = q.reshape(nq // cq, cq, -1)
        ss = segs.reshape(nq // cq, cq, keep)
        bd, bi = jax.lax.map(
            lambda ab: _rescore_native_block(
                ab[0], ab[1], x, xn_tape, valid, rerank_tape, m, k,
                metric_name, has_rerank,
            ),
            (qs, ss),
        )
        return bd.reshape(nq, k), bi.reshape(nq, k)
    return _rescore_native_block(
        q, segs, x, xn_tape, valid, rerank_tape, m, k, metric_name,
        has_rerank,
    )


def _gather_segment_blocks(xb: jax.Array, segs: jax.Array) -> jax.Array:
    """Gather [keep] 32-row sub-segment blocks per query from the blocked
    tape view xb [S, 32*d] via XLA take. A Pallas per-block-DMA variant
    (native-sublane-tiled views, one big descriptor per segment) was
    A/B'd in round 4 and LOST: 11.9 vs 9.5 ms full-scan at qb=256
    (benchmarks/profile_scan.py) — XLA's gather already moves these
    blocks at the DMA-issue envelope, and phase B's ~23 GB/s effective
    rate is the chained dependency (gather -> rescore -> select), not a
    fixable gather inefficiency. Finding recorded in docs/BENCH.md."""
    return jnp.take(xb, jnp.maximum(segs, 0), axis=0)


def _rescore_native_block(q, segs, x, xn_tape, valid, rerank_tape, m, k,
                          metric_name, has_rerank):
    metric = Metric.parse(metric_name)
    nq, d = q.shape
    keep = segs.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (nq, keep, _SUBSEG), 2)
    rows = jnp.maximum(segs, 0)[:, :, None] * _SUBSEG + lanes
    rows = rows.reshape(nq, keep * _SUBSEG)
    rows = jnp.where(jnp.repeat(segs >= 0, _SUBSEG, axis=1), rows, -1)
    # gather whole sub-segments as contiguous blocks (one 32-row
    # descriptor each) instead of keep*32 individual sub-512B rows — the
    # per-row descriptor issue rate made the row gather 10x slower
    # (measured 24.9 ms vs 2.1 ms for the whole winnow pass at 1M x 128)
    xb = x.reshape(x.shape[0] // _SUBSEG, _SUBSEG * d)
    xg = _gather_segment_blocks(xb, segs)  # [nq, keep, 32*d]
    if has_rerank:
        # bf16 scoring: int8 values are exact in bf16 and phase C reranks
        # the m-pool at f32, so only the q rounding (~0.4%) can perturb
        # the m-boundary — covered by the m > k margin. The f32-HIGHEST
        # batched matvec here was ~6x the whole winnow pass's time.
        g = xg.reshape(nq, keep * _SUBSEG, d).astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            g, q.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    else:
        g = xg.reshape(nq, keep * _SUBSEG, d).astype(jnp.float32)
        dots = jax.lax.dot_general(
            g, q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    # row norms ride the precomputed tape (same sub-segment gather) —
    # recomputing them from an f32 copy of the gathered block cost more
    # HBM traffic than the gather itself
    xnb = xn_tape.reshape(xn_tape.shape[0] // _SUBSEG, _SUBSEG)
    xn = jnp.take(xnb, jnp.maximum(segs, 0), axis=0).reshape(nq, keep * _SUBSEG)
    dd = _epilogue(dots, qn, xn, metric)
    # validity rides the same sub-segment gather as the norms: an
    # element gather (take(valid, safe) — keep*32 scattered 1-byte
    # loads per query) dominated this phase at 1M x 128 int8
    vb = valid.reshape(valid.shape[0] // _SUBSEG, _SUBSEG)
    okg = jnp.take(vb, jnp.maximum(segs, 0), axis=0).reshape(nq, keep * _SUBSEG)
    ok = (rows >= 0) & okg
    dd = jnp.where(ok & ~jnp.isnan(dd), dd, _INF)
    bd, bp = _iter_min_k(dd, m) if m <= _ITER_K_MAX else (
        lambda nt: (-nt[0], nt[1])
    )(jax.lax.top_k(-dd, m))
    bi = jnp.take_along_axis(rows, bp, axis=1)  # [nq, m]
    bi = jnp.where(jnp.isfinite(bd), bi, -1)
    if not has_rerank:
        return bd[:, :k], bi[:, :k]
    # phase C: exact f32 rerank of the m-wide pool from the side tape
    rv = jnp.take(rerank_tape, jnp.maximum(bi, 0), axis=0).astype(jnp.float32)
    if metric == Metric.L2SQ:
        # direct difference form: the dot-product identity loses digits to
        # cancellation at byte magnitudes (see index/search.py rerank)
        diff = q[:, None, :] - rv
        rd = jnp.sum(diff * diff, axis=-1)
    else:
        rdots = jnp.einsum("bcd,bd->bc", rv, q,
                           preferred_element_type=jnp.float32)
        rn = jnp.sum(rv * rv, axis=-1)
        rd = _epilogue(rdots, qn, rn, metric)
    rd = jnp.where((bi >= 0) & ~jnp.isnan(rd), rd, _INF)
    rd, ri = jax.lax.sort((rd, bi), dimension=1, num_keys=1, is_stable=True)
    return rd[:, :k], jnp.where(jnp.isfinite(rd[:, :k]), ri[:, :k], -1)


def _native_tile(nx: int, d: int, qb: int, itemsize: int) -> int:
    """x-block rows: the double-buffered x block gets ~7 MB; live f32
    sub-tile temporaries (~6x [qb, 512]) plus the q/out blocks take the
    rest of the ~16 MB VMEM budget."""
    t = (7 << 20) // (2 * d * itemsize)
    t = max(1024, min(32768, t // 1024 * 1024))
    return min(t, round_up(nx, 1024))


def scan_topk(
    q: jax.Array,
    tape: jax.Array,
    k: int,
    metric,
    valid_mask: Optional[jax.Array] = None,
    x_norms: Optional[jax.Array] = None,
    rerank_tape: Optional[jax.Array] = None,
    keep: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """ANN-grade exact scan over a storage-dtype tape.

    q [nq, d] f32 (same scaled units as the tape); tape [nx, d] int8 /
    bf16 / f32; x_norms optional f32 [nx] squared norms of the stored
    values (computed here if absent); rerank_tape optional f32/bf16
    [nx, d] full-precision side tape for the final exact rerank.
    Returns (dists [nq, k] f32 ascending, slot ids [nq, k] i32, -1 pad).
    Distances are exact w.r.t. the rerank tape when given, else w.r.t.
    the stored (quantized) values.

    Prefer `bruteforce_topk` for the bit-exact oracle path; this is the
    serving path (phases A/B keep 32*keep candidates per query chosen by
    the two-level exact winnow bound, so dropped true winners are
    measured-rare; the flagship bench reports its recall).
    """
    from vss_tpu.utils import use_pallas

    metric = Metric.parse(metric)
    nq, d0 = q.shape
    nx = tape.shape[0]
    if not (use_pallas() and native_scan_supported(tape.dtype)
            and nx > 16 * _SEG and k <= SCAN_K_MAX):
        from vss_tpu.ops.topk import bruteforce_topk

        # fallback scores the f32 side tape when one exists (exact
        # distances, same contract as the kernel path's phase C)
        base = rerank_tape if rerank_tape is not None else tape
        return bruteforce_topk(q, base.astype(jnp.float32), k, metric,
                               valid_mask=valid_mask)
    qb = min(int(os.environ.get("VSS_SCAN_QB", "256")), round_up(nq, 8))
    itemsize = jnp.dtype(tape.dtype).itemsize
    d = round_up(d0, 128)
    tile = _native_tile(nx, d, qb, itemsize)
    # 1024-row sub-tiles: per-subtile stores bound the live [sub, qb]
    # f32 temporaries, and 1024 rows = 32 sub-segment output sublanes,
    # satisfying the dynamic store's 8-sublane alignment
    subt = max(1, tile // 1024)
    xp = pad_to(pad_to(tape, 1, 128), 0, tile)
    if valid_mask is None:
        valid_mask = jnp.ones((nx,), jnp.bool_)
    vp = pad_to(valid_mask, 0, tile, value=False)
    # norms/validity ride as COLUMN vectors: the kernel's dots are
    # transposed (tape rows on sublanes), so its epilogue broadcasts
    # per-row values along the query (lane) axis
    v2 = vp.astype(jnp.int32)[:, None]
    if x_norms is None:
        xf = xp.astype(jnp.float32)
        x_norms = jnp.sum(xf * xf, axis=-1)
    xn2 = pad_to(x_norms.astype(jnp.float32), 0, tile)[:, None]
    qp = pad_to(pad_to(q.astype(jnp.float32), 1, 128), 0, qb)
    if keep is None:
        # margin over the exact-arithmetic bound: at most k segments can
        # hold the true top-k (each such segment's min <= d_k, and only
        # k rows are <= d_k), so selection only needs slack for bf16
        # proxy noise near the boundary. Swept at 1M x 128 int8
        # (BENCH_r04 keep sweep): keep=k+2 still measures recall
        # 1.00000 on iid-uniform data — the near-tie-heavy worst case —
        # and serves 64.2k qps vs 50.2k at the old 2k margin (phase B
        # rows scale with keep). k//8 grows the margin with k.
        keep = min(k + max(2, k // 8), xp.shape[0] // _SEG)
    keep = min(keep, xp.shape[0] // _SEG)
    segs = _native_segmin_scan(
        qp.astype(jnp.bfloat16), xp, xn2, v2, keep, metric.value, tile, qb,
        subt,
    )
    has_rr = rerank_tape is not None
    if not has_rr:
        rerank_tape = xp[:, :1]  # placeholder operand (unused)
    else:
        rerank_tape = pad_to(rerank_tape, 1, 128) if d != d0 else rerank_tape
        rerank_tape = pad_to(rerank_tape, 0, tile)
    m = min(max(2 * k, k + 6), keep * _SUBSEG) if has_rr else k
    outd, outi = _rescore_native(
        qp.astype(jnp.float32), segs, xp, xn2[:, 0], vp, rerank_tape, m, k,
        metric.value, has_rr,
    )
    return outd[:nq], outi[:nq]
