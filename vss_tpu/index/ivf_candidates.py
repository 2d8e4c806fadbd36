"""IVF-window candidate generation for bulk graph construction.

The exact candidate pass (`index/exact_build.exact_knn`) scores every
point against every other point — n^2 distances whose *selection* (top-C
over 1M columns per row) dominates the 1M build profile, not the matmuls.
This module replaces it with a locality-blocked pass, the classic
IVF/partition trick re-shaped for the MXU:

  1. assign every point to its nearest of ~n/window sampled centers
     (one tiled matmul pass),
  2. sort points by center id and cut the sorted order into fixed-size
     `window`-row buckets (equal-size by construction — no ragged
     clusters, no overflow paths, every shape static),
  3. rank buckets by centroid distance; each bucket's points score
     against the union of its `probes` nearest buckets' points — a
     [window, probes*window] tile per bucket, batched G buckets per
     dispatch,
  4. exact top-C inside that union, mapped back to original slot ids.

Per point the candidate pool shrinks from n to probes*window (~4k at the
defaults), cutting both the distance work and — the actual bottleneck —
the width of the top-C selection by ~250x at 1M rows. The lists are
approximate (a true neighbor outside the probed buckets is missed), which
is the same trade the reference's insert-side beam search makes
(`/root/reference/src/include/usearch/index.hpp:3855-3922` approximates
the very same lists with ef_construction-wide beams); graph quality is
enforced downstream by the same refine/backlink/repair passes, and the
benchmark's recall bar is the arbiter. The graph remains deterministic
given `seed`.

Used by `index/exact_build.build_graph_exact(candidate_mode=...)`; 'auto'
switches to this path at bulk scale.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vss_tpu.ops.distance import Metric, _epilogue
from vss_tpu.utils import cdiv, round_up

__all__ = ["ivf_candidates"]

_INF = float("inf")


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_pass(x, centers, chunk: int):
    """Nearest-center id for every row of x (l2 geometry is fine for all
    supported metrics here: assignment only PARTITIONS space, and the
    per-point scoring that follows uses the real metric; bf16 inputs for
    the same reason — partition boundaries are not quality-sensitive)."""
    n_pad = x.shape[0]
    cn = jnp.sum(centers * centers, axis=1)[None, :]
    cb = centers.astype(jnp.bfloat16)

    def body(i, out):
        s0 = i * chunk
        q = jax.lax.dynamic_slice_in_dim(x, s0, chunk).astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q, cb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = cn - 2.0 * dots  # + ||q||^2, constant per row: argmin-invariant
        a = jnp.argmin(d, axis=1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(out, a, (s0,))

    out = jnp.zeros((n_pad,), jnp.int32)
    return jax.lax.fori_loop(0, n_pad // chunk, body, out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "C", "metric_name", "G", "window", "probes", "approx", "score_bf16",
    ),
)
def _score_groups(
    win_tape,   # [W, window, d] sorted+padded tape (f32, or bf16 on TPU)
    gids,       # [W, window] i32 original slot id per sorted position (-1 pad)
    nbr,        # [W, probes] i32 neighbor-bucket ids
    C: int,
    metric_name: str,
    G: int,
    window: int,
    probes: int,
    approx: bool = False,
    score_bf16: bool = False,
):
    """Top-C candidates for every point, bucket-blocked. Returns
    (cand_d [W*window, C] ascending f32, cand_i [W*window, C] original
    slot ids, -1 padded) in SORTED-position row order.

    score_bf16: keep the probe-bucket gather AND the [G, window, K]
    distance matrix in bf16 — the pass is HBM-bound on exactly those two
    buffers (the matmul itself is ~1 TFLOP at 1M). Candidate ORDERING is
    all that survives this pass (refine/backlinks re-score at f32), and
    bf16 near-tie shuffles are indistinguishable from the bf16-input
    rounding the MXU matmul already applies — same trade as
    `exact_build._knn_all(dist_bf16=True)`."""
    metric = Metric.parse(metric_name)
    W, _, d = win_tape.shape
    K = probes * window
    dd = jnp.bfloat16 if score_bf16 else jnp.float32

    def body(g, out):
        out_d, out_i = out
        w0 = g * G
        nb = jax.lax.dynamic_slice_in_dim(nbr, w0, G)          # [G, probes]
        keys = jnp.take(win_tape, nb, axis=0)                  # [G, probes, window, d]
        keys = keys.reshape(G, K, d)
        kid = jnp.take(gids, nb, axis=0).reshape(G, K)         # original ids
        q = jax.lax.dynamic_slice_in_dim(win_tape, w0, G)      # [G, window, d]
        qid = jax.lax.dynamic_slice_in_dim(gids, w0, G)        # [G, window]
        qc = q if win_tape.dtype == jnp.float32 else q.astype(jnp.bfloat16)
        kc = (
            keys if win_tape.dtype == jnp.float32
            else keys.astype(jnp.bfloat16)
        )
        dots = jnp.einsum(
            "gqd,gkd->gqk", qc, kc, preferred_element_type=jnp.float32
        )
        qf = q.astype(jnp.float32)
        kf = keys.astype(jnp.float32)
        qn = jnp.sum(qf * qf, axis=2)[:, :, None]
        kn = jnp.sum(kf * kf, axis=2)[:, None, :]
        dist = _epilogue(dots, qn, kn, metric).astype(dd)      # [G, window, K]
        bad = (kid[:, None, :] < 0) | (kid[:, None, :] == qid[:, :, None])
        dist = jnp.where(bad, jnp.asarray(_INF, dd), dist)
        flat = dist.reshape(G * window, K)
        if approx:
            # the TPU's PartialReduce top-k: a full [2048, 4096] sort per
            # group dominated the candidate pass; near-exact selection is
            # fine for candidate LISTS (refine/backlinks re-score at f32)
            cd, pos = jax.lax.approx_min_k(flat, C, recall_target=0.98)
        else:
            neg, pos = jax.lax.top_k(-flat, C)
            cd = -neg
        ci = jnp.take_along_axis(
            kid.reshape(G, 1, K).repeat(window, axis=1).reshape(G * window, K),
            pos, axis=1,
        )
        ci = jnp.where(jnp.isfinite(cd), ci, -1)
        # out_d is f32 regardless of the scoring dtype (the module contract
        # is "cand_d ascending f32"); under score_bf16 the selected values
        # are bf16 and dynamic_update_slice requires matching dtypes
        cd = cd.astype(jnp.float32)
        return (
            jax.lax.dynamic_update_slice(out_d, cd, (w0 * window, 0)),
            jax.lax.dynamic_update_slice(out_i, ci, (w0 * window, 0)),
        )

    out = (
        jnp.full((W * window, C), _INF, jnp.float32),
        jnp.full((W * window, C), -1, jnp.int32),
    )
    return jax.lax.fori_loop(0, W // G, body, out)


def ivf_candidates(
    vecs: jax.Array,
    ids: jax.Array,
    C: int,
    metric,
    *,
    window: int = 256,
    probes: int = 16,
    seed: int = 0,
    progress: Optional[Callable[[int, int], None]] = None,
):
    """Locality-blocked top-C candidate lists (see module docstring).

    Same contract as `exact_build.exact_knn`: vecs [n, d], ids [n] global
    ids; returns (dists [n, C] ascending f32, ids [n, C] i32, -1 padded)
    in the original row order, self-matches excluded.
    """
    import os
    import sys
    import time as _time

    _dbg = os.environ.get("VSS_EXACT_DEBUG") == "1"
    _t0 = _time.perf_counter()

    def _mark(label, *arrs):
        if _dbg:
            for a in arrs:
                jax.block_until_ready(a)
            print(
                f"[ivf] {label}: {_time.perf_counter() - _t0:.2f}s",
                file=sys.stderr, flush=True,
            )

    metric = Metric.parse(metric)
    n, d = vecs.shape
    W = cdiv(n, window)
    if W <= probes + 1:
        from vss_tpu.index.exact_build import exact_knn

        if vecs.dtype != jnp.float32:  # tiny-corpus fallback only
            vecs = jnp.asarray(vecs).astype(jnp.float32)
        return exact_knn(vecs, ids, C, metric)
    probes = min(probes, W)
    C = min(C, probes * window - 1)
    # the input keeps its dtype: an int8 STORAGE tape flows through at
    # 1/4 the f32 footprint (only candidate ordering survives this
    # pass; scoring casts per block)
    xv = jnp.asarray(vecs)

    if progress is not None:
        progress(0, n)
    # 1. centers: a random sample of the points themselves
    rng = np.random.default_rng(seed)
    centers = jnp.take(
        xv, jnp.asarray(rng.choice(n, W, replace=False).astype(np.int32)),
        axis=0,
    ).astype(jnp.float32)
    chunk = min(4096, round_up(n, 256))
    n_pad = round_up(n, chunk)
    x_pad = xv if n_pad == n else jnp.pad(xv, ((0, n_pad - n), (0, 0)))
    assign = np.asarray(_assign_pass(x_pad, centers, chunk)[:n])
    _mark("assign")
    if progress is not None:
        progress(max(n // 8, 1), n)

    # 2. equal-size buckets: sort by center id, cut into window-row
    # slices. W is padded to a multiple of 8 with all-pad sentinel
    # buckets so step 4 always dispatches G=8 tiles (W is otherwise
    # arbitrary — 1M/256 = 3907 is prime and would force G=1).
    W_pad = round_up(W, min(8, W))
    order = np.argsort(assign, kind="stable").astype(np.int32)
    n_sorted = W_pad * window
    order_pad = np.full(n_sorted, -1, np.int32)
    order_pad[:n] = order
    order_j = jnp.asarray(order_pad)
    from vss_tpu.utils import use_pallas  # TPU detection, test-overridable

    score_bf16 = use_pallas()

    # permute + (on TPU) convert to the bf16 scoring dtype in ONE fused
    # program: materializing the permuted tape at f32 and then casting
    # kept ~5.8 GB live at 1M x 960 and OOM'd the 16 GB chip (round 5)
    @functools.partial(jax.jit, static_argnames=("wp", "win", "bf16"))
    def _permute(xv, order_j, wp: int, win: int, bf16: bool):
        xs = jnp.take(xv, jnp.maximum(order_j, 0), axis=0)
        if bf16:
            xs = xs.astype(jnp.bfloat16)
        xs = jnp.where((order_j >= 0)[:, None], xs, 0)
        return xs.reshape(wp, win, xv.shape[1])

    # int8 inputs keep int8 windows (smallest footprint; the scorer
    # casts per block); f32 inputs convert to bf16 on TPU
    win_tape = _permute(
        xv, order_j, W_pad, window,
        score_bf16 and xv.dtype == jnp.float32,
    )
    gids = jnp.where(
        order_j >= 0,
        jnp.take(jnp.asarray(np.asarray(ids, np.int32)),
                 jnp.maximum(order_j, 0)),
        -1,
    ).reshape(W_pad, window)
    _mark("sort+shuffle", win_tape, gids)

    # 3. bucket neighbor lists by centroid distance (self included —
    # its own bucket is always probed); sentinel buckets are pushed to
    # +inf so no real bucket ever probes one
    occ = jnp.sum(gids >= 0, axis=1)
    cnt = jnp.maximum(occ, 1)[:, None]
    # f32 accumulation: win_tape may be bf16 on TPU (bucket ranking only
    # needs centroid ordering, but bf16 accumulation over 256 rows is
    # needlessly sloppy)
    cents = jnp.sum(win_tape, axis=1, dtype=jnp.float32) / cnt
    cd = jnp.sum(cents * cents, axis=1)
    dots = cents @ cents.T
    dmat = cd[:, None] + cd[None, :] - 2.0 * dots
    dmat = jnp.where((occ == 0)[None, :], _INF, dmat)
    _, nbr = jax.lax.top_k(-dmat, probes)
    nbr = nbr.astype(jnp.int32)
    _mark("bucket nbr lists", nbr)
    if progress is not None:
        progress(max(n // 4, 1), n)

    # 4. blocked scoring: G buckets per dispatch (G*window-query tiles)
    G = min(8, W_pad)
    approx = use_pallas() and C <= (probes * window) // 8
    sd, si = _score_groups(
        win_tape, gids, nbr, C, metric.value, G, window, probes, approx,
        score_bf16=score_bf16,
    )
    _mark("score", sd, si)
    if progress is not None:
        progress(max(3 * n // 4, 1), n)

    # 5. back to original row order: row r of the output = the sorted
    # position holding original row r
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    inv_j = jnp.asarray(inv.astype(np.int32))
    out_d = jnp.take(sd, inv_j, axis=0)
    out_i = jnp.take(si, inv_j, axis=0)
    _mark("unpermute", out_i)
    if progress is not None:
        progress(n, n)
    return out_d, out_i
