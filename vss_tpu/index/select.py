"""Batched select-neighbors heuristic.

The TPU-native form of the reference's `refine_` neighbor-selection
(`/root/reference/src/include/usearch/index.hpp:4030-4077`): keep a
candidate iff it is closer to the query than to every already-kept
neighbor; fill remaining slots from the pruned list in distance order.

The reference runs this per node on a tiny heap; here it runs for A rows
at once on fixed-size arrays: one [A, C, C] candidate-to-candidate
distance tensor (an MXU einsum) followed by a C-step `fori_loop` of pure
[A, C] mask logic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vss_tpu.ops.distance import Metric, _epilogue

__all__ = ["select_neighbors", "pairwise_rowwise"]

_INF = float("inf")  # python scalar: no backend init at import
_BIG = 1e30


def pairwise_rowwise(vecs: jax.Array, metric) -> jax.Array:
    """Per-row pairwise distances: [A, C, d] -> [A, C, C]."""
    metric = Metric.parse(metric)
    vecs = vecs.astype(jnp.float32)
    dots = jnp.einsum("acd,aed->ace", vecs, vecs, preferred_element_type=jnp.float32)
    n = jnp.sum(vecs * vecs, axis=-1)
    return _epilogue(dots, n[:, :, None], n[:, None, :], metric)


def select_neighbors(
    q_vecs: jax.Array,
    cand_i: jax.Array,
    cand_d: jax.Array,
    vectors: jax.Array,
    m: int,
    metric,
    active: jax.Array | None = None,
    cand_vecs: jax.Array | None = None,
) -> jax.Array:
    """Pick up to `m` diverse neighbors per row from candidate lists.

    q_vecs: [A, d] the node being connected; cand_i/cand_d: [A, C]
    candidate slots (-1 = none, must be pre-deduplicated) and distances to
    q; vectors: [cap, d] slot tape. Returns chosen [A, m] i32, -1 padded,
    ordered kept-first then fill, each group ascending by distance.
    Rows with active=False return all -1. `cand_vecs` [A, C, d] skips the
    internal gather when the caller already holds the candidate vectors
    (the gather is the pass's HBM cost; callers scoring distances anyway
    should share it).
    """
    metric = Metric.parse(metric)
    A, C = cand_i.shape
    if C < m:
        pad = m - C
        cand_i = jnp.pad(cand_i, ((0, 0), (0, pad)), constant_values=-1)
        cand_d = jnp.pad(cand_d, ((0, 0), (0, pad)), constant_values=_INF)
        if cand_vecs is not None:
            cand_vecs = jnp.pad(cand_vecs, ((0, 0), (0, pad), (0, 0)))
        C = m
    cand_d = jnp.where(cand_i >= 0, cand_d, _INF)
    # sort candidates ascending by distance
    cand_d, order = jax.lax.sort_key_val(
        cand_d,
        jnp.broadcast_to(jax.lax.broadcasted_iota(jnp.int32, (1, C), 1), (A, C)),
        dimension=1,
    )
    cand_i = jnp.take_along_axis(cand_i, order, axis=1)

    if cand_vecs is None:
        cand_vecs = jnp.take(vectors, jnp.maximum(cand_i, 0), axis=0)  # [A, C, d]
    else:
        cand_vecs = jnp.take_along_axis(
            cand_vecs, order[:, :, None], axis=1
        )
    d_cc = pairwise_rowwise(cand_vecs, metric)  # [A, C, C]

    def body(c, state):
        kept, cnt = state
        # min distance from candidate c to any kept candidate
        row = jax.lax.dynamic_slice_in_dim(d_cc, c, 1, axis=1)[:, 0, :]  # [A, C]
        d_to_kept = jnp.min(jnp.where(kept, row, _INF), axis=1)
        dc = jax.lax.dynamic_slice_in_dim(cand_d, c, 1, axis=1)[:, 0]
        ok = jnp.isfinite(dc) & (dc < d_to_kept) & (cnt < m)
        kept = jax.lax.dynamic_update_slice_in_dim(
            kept, ok[:, None], c, axis=1
        )
        return kept, cnt + ok.astype(jnp.int32)

    kept = jnp.zeros((A, C), jnp.bool_)
    cnt = jnp.zeros((A,), jnp.int32)
    kept, cnt = jax.lax.fori_loop(0, C, body, (kept, cnt))

    # kept first (ascending d), then pruned fill (ascending d), invalid last
    key = jnp.where(kept, cand_d, jnp.where(jnp.isfinite(cand_d), cand_d + _BIG, _INF))
    neg_top, pos = jax.lax.top_k(-key, m)
    chosen = jnp.take_along_axis(cand_i, pos, axis=1)
    chosen = jnp.where(jnp.isfinite(-neg_top), chosen, -1)
    if active is not None:
        chosen = jnp.where(active[:, None], chosen, -1)
    return chosen
