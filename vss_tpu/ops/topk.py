"""Brute-force exact k-NN and top-k merge primitives.

The TPU-native replacement for the reference's exact scan path
(`/root/reference/src/include/usearch/index.hpp:4004-4025`, `search_exact_`)
and the merge step used by sharded search. Distances are computed in
MXU-sized chunks (Pallas tiles on TPU) and reduced with a running top-k
carried through a `lax.scan` — memory stays O(nq * (k + chunk)) instead of
O(nq * nx).

Conventions:
  * distances ascending, f32; invalid/padded slots get +inf and id -1.
  * ties broken toward the lower slot id (lax.top_k is stable and earlier
    chunks are concatenated first), which keeps results deterministic.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vss_tpu.ops.distance import Metric, dispatch_pairwise, pairwise
from vss_tpu.utils import pad_to, round_up

__all__ = ["bruteforce_topk", "merge_topk"]

_INF = float("inf")  # python scalar: no backend init at import


def _choose_chunk(nx: int) -> int:
    if nx <= 4096:
        return round_up(nx, 512)
    return min(round_up(nx, 512), 65536)


def _iter_min_k(d: jax.Array, k: int):
    """Exact smallest-k by k passes of (argmin, mask): O(k*C) VPU work
    instead of a width-C sort — much faster than lax.top_k on TPU for the
    small k / very wide rows shape of a brute-force scan chunk."""
    B = d.shape[0]
    rows = jnp.arange(B)
    vals, idxs = [], []
    cur = d
    for _ in range(k):
        i = jnp.argmin(cur, axis=1).astype(jnp.int32)
        v = jnp.take_along_axis(cur, i[:, None], axis=1)[:, 0]
        vals.append(v)
        idxs.append(i)
        cur = cur.at[rows, i].set(_INF)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


# beyond this k, one sort beats k argmin passes
_ITER_K_MAX = 32


@functools.partial(
    jax.jit, static_argnames=("k", "metric_name", "chunk", "use_pallas_tiles")
)
def _bruteforce_topk_impl(q, x, valid, k, metric_name, chunk, use_pallas_tiles):
    metric = Metric.parse(metric_name)
    nq = q.shape[0]
    nxp = x.shape[0]
    n_chunks = nxp // chunk
    xc = x.reshape(n_chunks, chunk, x.shape[1])
    vc = valid.reshape(n_chunks, chunk)

    pair = dispatch_pairwise if use_pallas_tiles else pairwise

    def step(carry, inp):
        best_d, best_i = carry
        x_chunk, v_chunk, c_idx = inp
        d = pair(q, x_chunk, metric)  # [nq, chunk]
        d = jnp.where(v_chunk[None, :], d, _INF)
        d = jnp.where(jnp.isnan(d), _INF, d)  # NULL queries -> no matches
        if k <= _ITER_K_MAX:
            cd, ci_local = _iter_min_k(d, k)
            ci = c_idx * chunk + ci_local
            cat_d = jnp.concatenate([best_d, cd], axis=1)
            cat_i = jnp.concatenate([best_i, ci], axis=1)
            # stable merge of two sorted-ish lists, tiny width
            neg_top, pos = jax.lax.top_k(-cat_d, k)
            return (-neg_top, jnp.take_along_axis(cat_i, pos, axis=1)), None
        ids = c_idx * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        ids = jnp.broadcast_to(ids, (nq, chunk))
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_d, new_i), None

    init = (
        jnp.full((nq, k), _INF, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init, (xc, vc, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i


# ---------------------------------------------------------------------------
# Fused Pallas scan: the XLA path above materializes every [nq, chunk]
# distance block in HBM and the iterative min-k re-reads it k times —
# measured 101 ms per 512-query batch at 1M x 128 (5 GB/s effective: the
# scan was distance-MATRIX-bound, not table-bound).
#
# The fast exact algorithm is segment-min winnowing. View each row's 1M
# distances as segments of 128 lanes. CLAIM: the top-k elements lie inside
# the k segments with the smallest segment-minima. Proof: if element x is
# in the top-k but x's segment is not among those k, then >= k segments
# have a smaller minimum than x's segment's min <= x, and each contributes
# an element < x — so x has >= k elements below it, contradiction.
#
# So the kernel streams the table once, scores a tile on the MXU, reduces
# it to per-segment minima (ONE extra VPU pass over the distances — this
# is what makes it fast; extracting exact top-k per tile costs k passes
# and was measured VPU-bound at ~80 ms/batch), and writes the [qb, S]
# seg-min block straight to HBM. There is NO cross-step state: an earlier
# design carried a running top-seg pool in VMEM scratch, and the carry
# serialized consecutive grid steps (measured ~33-60 us of fixed cost per
# step); the full seg-min matrix is only nq * nx/128 * 4 bytes (16 MB at
# 512 x 1M), so selecting the k smallest segments afterwards in XLA is
# cheap. The candidate segments (k * 128 rows per query) are then
# re-scored in one batched matmul and reduced exactly.

_SEG = 128  # lanes per segment (one vreg row)


def _scan_segmin_kernel(
    q_ref, qn_ref, x_ref, v_ref, out_ref,
    *, tile: int, metric_name: str, highest: bool, subt: int = 1,
):
    metric = Metric.parse(metric_name)
    q = q_ref[:]
    qb = q.shape[0]
    prec = (
        jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    )
    sub = tile // subt

    def one_subtile(s):
        """Distances + seg-mins for sub-tile s: bounds the live [qb, sub]
        temporaries so the x block can be large (fewer grid steps — the
        per-step fixed cost measured ~33 us, dominating small tiles)."""
        x = x_ref[pl.ds(s * sub, sub), :]
        dots = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [qb, sub]
        ok = v_ref[:, pl.ds(s * sub, sub)] > 0  # [1, sub]
        if metric == Metric.IP:
            d = 1.0 - dots
        else:
            xn = jnp.sum(x * x, axis=1)[None, :]
            qn = qn_ref[:]  # [qb, 1]
            if metric == Metric.L2SQ:
                d = jnp.maximum(qn + xn - 2.0 * dots, 0.0)
            else:  # cosine (zero-vector guards as ops/distance._epilogue)
                denom = jnp.sqrt(qn * xn)
                cos = jnp.where(
                    denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0), 0.0
                )
                d = jnp.where((qn == 0.0) & (xn == 0.0), 0.0, 1.0 - cos)
        d = jnp.where(ok & ~jnp.isnan(d), d, _INF)
        return jnp.min(d.reshape(qb, sub // _SEG, _SEG), axis=2)

    # TRANSPOSED output [S, qb]: Mosaic requires the block's last dim be
    # 128-divisible (or full) — qb is, S (tile/128) is not
    out_ref[:] = jnp.concatenate(
        [one_subtile(s) for s in range(subt)], axis=1
    ).T


@functools.partial(
    jax.jit,
    static_argnames=("keep", "metric_name", "tile", "qb", "highest", "subt"),
)
def _segmin_scan_pallas(q, qn, x, valid2d, keep, metric_name, tile, qb,
                        highest, subt=1):
    nq, d = q.shape
    nxp = x.shape[0]
    S = tile // _SEG
    grid = (nq // qb, nxp // tile)
    segmins = pl.pallas_call(
        functools.partial(
            _scan_segmin_kernel, tile=tile,
            metric_name=metric_name, highest=highest, subt=subt,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda i, j: (i, 0)),
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((S, qb), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((nxp // _SEG, nq), jnp.float32),
    )(q, qn, x, valid2d)
    segmins = segmins.T  # [nq, NS]
    # exact k smallest segments per query (iterative min-k: k narrow
    # passes beat a width-NS sort; ties resolve to the lowest segment id,
    # preserving the lowest-slot-id contract downstream)
    sd, si = _iter_min_k(segmins, keep) if keep <= _ITER_K_MAX else (
        lambda nt_: (-nt_[0], nt_[1])
    )(jax.lax.top_k(-segmins, keep))
    return sd, jnp.where(jnp.isfinite(sd), si, -1)


@functools.partial(jax.jit, static_argnames=("k", "metric_name", "highest"))
def _rescore_segments(q, segs, x, valid, k, metric_name, highest):
    """Exact top-k within each query's candidate segments. segs [nq, keep]
    (segment ids, -1 pad); gathers keep*128 rows per query (consecutive
    128-row blocks — near-stream gather), scores in one batched matmul,
    reduces with the iterative min-k. Chunked over queries so the
    gathered [cq, keep*128, d] block stays a few hundred MB at worst."""
    nq = q.shape[0]
    keep = segs.shape[1]
    limit = max(8, (1 << 26) // max(keep * _SEG * x.shape[1], 1))
    cq = min(nq, 1 << (limit.bit_length() - 1))  # pow2 -> divides padded nq
    if nq > cq and nq % cq == 0:
        qs = q.reshape(nq // cq, cq, -1)
        ss = segs.reshape(nq // cq, cq, keep)
        bd, bi = jax.lax.map(
            lambda ab: _rescore_block(ab[0], ab[1], x, valid, k,
                                      metric_name, highest),
            (qs, ss),
        )
        return bd.reshape(nq, k), bi.reshape(nq, k)
    return _rescore_block(q, segs, x, valid, k, metric_name, highest)


def _rescore_block(q, segs, x, valid, k, metric_name, highest):
    metric = Metric.parse(metric_name)
    nq, d = q.shape
    keep = segs.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (nq, keep, _SEG), 2)
    rows = jnp.maximum(segs, 0)[:, :, None] * _SEG + lanes  # [nq, keep, 128]
    rows = rows.reshape(nq, keep * _SEG)
    rows = jnp.where(jnp.repeat(segs >= 0, _SEG, axis=1), rows, -1)
    safe = jnp.minimum(jnp.maximum(rows, 0), x.shape[0] - 1)
    xg = jnp.take(x, safe, axis=0)  # [nq, C, d]
    prec = (
        jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    )
    dots = jax.lax.dot_general(
        xg, q, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [nq, C]
    ok = (rows >= 0) & jnp.take(valid, safe)
    if metric == Metric.IP:
        dd = 1.0 - dots
    else:
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        xn = jnp.sum(xg * xg, axis=2)
        if metric == Metric.L2SQ:
            dd = jnp.maximum(qn + xn - 2.0 * dots, 0.0)
        else:
            denom = jnp.sqrt(qn * xn)
            cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0), 0.0)
            dd = jnp.where((qn == 0.0) & (xn == 0.0), 0.0, 1.0 - cos)
    dd = jnp.where(ok & ~jnp.isnan(dd), dd, _INF)
    # exact min-k with lowest-id tie break: bias by tiny id ordering is
    # unnecessary — _iter_min_k's argmin takes the first (lowest row)
    # occurrence, and rows are laid out ascending per query
    best_d, best_p = _iter_min_k(dd, k) if k <= _ITER_K_MAX else (
        lambda nt: (-nt[0], nt[1])
    )(jax.lax.top_k(-dd, k))
    best_i = jnp.take_along_axis(rows, best_p, axis=1)
    return best_d, jnp.where(jnp.isfinite(best_d), best_i, -1)


def _pallas_scan_tile(nx: int, d: int, qb: int) -> int:
    """DB-tile rows sized for the 16 MB VMEM budget. Mosaic's scoped
    allocation for the kernel measured ~4*tile*(8*qb + 2*d) bytes at
    qb=512/d=128 (the double-buffered x tile plus ~8 live [qb, tile]
    f32 temporaries across the matmul + epilogue + seg-min)."""
    budget = 13 * 2**20
    t = budget // (4 * (8 * qb + 2 * d))
    t = max(_SEG * 2, min(4096, t // 256 * 256))
    return min(t, round_up(nx, 256))


# k passes over the distance tile run on the VPU; past this k a sorted
# approach would win and the XLA path is used instead
_PALLAS_K_MAX = 64


def bruteforce_topk(
    q: jax.Array,
    x: jax.Array,
    k: int,
    metric,
    valid_mask: Optional[jax.Array] = None,
    chunk: Optional[int] = None,
    precision: str = "highest",
) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest neighbors of each query by full scan.

    q: [nq, d]; x: [nx, d]; valid_mask: optional bool [nx] (False = tombstone).
    Returns (dists [nq, k] ascending, slot_ids [nq, k] int32, -1 past the end).

    precision='highest' (default) keeps f32-exact distance ordering (the
    user-facing exact operator, bit-parity with the CPU oracle);
    'default' runs the MXU at bf16-input rate for ~6x more matmul
    throughput where near-tie reorderings are acceptable.
    """
    metric = Metric.parse(metric)
    from vss_tpu.utils import use_pallas  # late import: respects test env

    nq, d = q.shape
    nx = x.shape[0]
    if nx == 0:
        return (
            jnp.full((nq, k), _INF, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32),
        )
    if use_pallas() and k <= _PALLAS_K_MAX and nx > 4 * _SEG:
        highest = precision == "highest"
        # qb=256 keeps Mosaic's scoped-vmem estimate well under the 16 MB
        # limit (512 measured 18.6M at tile 768 WITH the old scratch
        # carry; the carry-free kernel has headroom — sweep VSS_SCAN_QB);
        # the cost is one extra table stream per 512 queries
        import os as _os

        qb = min(int(_os.environ.get("VSS_SCAN_QB", "256")), round_up(nq, 8))
        # sub-tiled steps: live temporaries scale with `sub`, the x block
        # (and so the grid-step count) with sub*subt — per-step fixed
        # cost measured ~33 us, so fewer, larger steps win
        # DEFAULT precision keeps bf16 input copies live alongside the
        # f32 sub-tile buffers (measured 17.5M scoped vmem at subt=8
        # where HIGHEST fit) — give it a smaller x block
        subt = max(1, int(_os.environ.get(
            "VSS_SCAN_SUBT", "8" if highest else "6"
        )))
        # sub-tile: 512 rows when the live-temp budget allows, else 256
        # (subt=8 at sub=640 measured 16.53M scoped vmem, 540K over; 512
        # fits). The transposed output block is [S=tile/128, qb], and
        # Mosaic needs the sublane dim S divisible by 8 -> tile must be a
        # multiple of 1024, so subt moves in steps of 1024/sub.
        sub = 512 if _pallas_scan_tile(nx, d, qb) >= 1024 else 256
        step = 1024 // sub
        # the double-buffered x block itself (2*tile*d*4) must stay
        # within ~8 MB — at 960-d an uncapped subt=8 block costs 15.7 MB
        tile_max_x = max(1024, (8 << 20) // (8 * d) // 1024 * 1024)
        subt = min(subt, tile_max_x // sub, round_up(nx, 1024) // sub)
        subt = max(step, subt // step * step)
        tile = sub * subt
        xf = x.astype(jnp.float32)
        xp = pad_to(xf, 0, tile)
        if valid_mask is None:
            valid_mask = jnp.ones((nx,), jnp.bool_)
        vp = pad_to(valid_mask, 0, tile, value=False)
        v2 = vp.astype(jnp.int32)[None, :]
        qp = pad_to(q.astype(jnp.float32), 0, qb)
        qn = jnp.sum(qp * qp, axis=1, keepdims=True)
        # keep k candidate segments at HIGHEST (provably exact; see the
        # seg-min claim above) — at DEFAULT precision keep 2k so near-tie
        # bf16 reorderings between phases cannot drop a true winner
        keep = min(k if highest else 2 * k, xp.shape[0] // _SEG)
        _, segs = _segmin_scan_pallas(
            qp, qn, xp, v2, keep, metric.value, tile, qb, highest, subt
        )
        outd, outi = _rescore_segments(
            qp, segs, xp, vp, k, metric.value, highest
        )
        return outd[:nq], outi[:nq]
    chunk = chunk or _choose_chunk(nx)
    x = pad_to(x.astype(jnp.float32), 0, chunk)
    if valid_mask is None:
        valid_mask = jnp.ones((nx,), jnp.bool_)
    valid = pad_to(valid_mask, 0, chunk, value=False)
    return _bruteforce_topk_impl(
        q.astype(jnp.float32), x, valid, k, metric.value, chunk, use_pallas()
    )


def merge_topk(dists: jax.Array, ids: jax.Array, k: int):
    """Merge per-source top-k lists into a global top-k.

    dists/ids: [..., S*k] or [S, nq, k] style — any layout where the last
    axis enumerates candidates per query after reshaping. Standard use:
      dists [nq, S*k], ids [nq, S*k] -> ([nq, k], [nq, k]).
    Used for the cross-shard k-way merge after an all_gather.
    """
    neg_top, pos = jax.lax.top_k(-dists, k)
    return -neg_top, jnp.take_along_axis(ids, pos, axis=-1)
