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


def bruteforce_topk(
    q: jax.Array,
    x: jax.Array,
    k: int,
    metric,
    valid_mask: Optional[jax.Array] = None,
    chunk: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest neighbors of each query by full scan.

    q: [nq, d]; x: [nx, d]; valid_mask: optional bool [nx] (False = tombstone).
    Returns (dists [nq, k] ascending, slot_ids [nq, k] int32, -1 past the end).
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
