"""Row gather kernels: random rows from an HBM-resident table.

The beam search's neighbor expansion is a random row gather — the
performance crux of graph traversal on TPU (SURVEY §7.4). XLA lowers
`jnp.take` to a generic gather whose throughput is limited by per-row
descriptor issue, not HBM bandwidth. This Pallas kernel drives the DMA
engines directly with a rolling window of outstanding row copies, and can
skip sentinel (-1) rows entirely — the XLA path must clamp and gather
them anyway.

Replaces the role of the reference's pointer-chasing neighbor reads
(`/root/reference/src/include/usearch/index.hpp:3929-3999`), where the
"gather" is the CPU cache hierarchy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vss_tpu.utils import cdiv, use_pallas

__all__ = ["gather_rows", "gather_rows_pallas"]

# Rows handled per grid program; bounds VMEM block to chunk*d*itemsize.
_CHUNK = 512
# Outstanding DMAs per program. Each copy is one table row (128B-4KB);
# deep windows keep the issue pipeline and several DMA engines busy.
# Tunable for on-chip sweeps: the beam gather measured ~18M rows/s
# (issue-rate-bound, ~2% of stream HBM BW) at the default window.
import os as _os

_NSEM = int(_os.environ.get("VSS_GATHER_NSEM", "32"))


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, chunk: int, skip_neg: bool):
    i = pl.program_id(0)
    base = i * chunk

    def dma(j):
        row = ids_ref[base + j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(jnp.maximum(row, 0), 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % _NSEM],
        )

    if skip_neg:
        # sentinel rows (-1) get no DMA; their output row is left as-is
        # (callers mask by id). Start/wait stay paired per slot via the
        # same predicate.
        def start(j):
            @pl.when(ids_ref[base + j] >= 0)
            def _():
                dma(j).start()

        def wait(j):
            @pl.when(ids_ref[base + j] >= 0)
            def _():
                dma(j).wait()

    else:
        def start(j):
            dma(j).start()

        def wait(j):
            dma(j).wait()

    for j in range(min(_NSEM, chunk)):
        start(j)

    def body(j, carry):
        wait(j)

        @pl.when(j + _NSEM < chunk)
        def _():
            start(j + _NSEM)

        return carry

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "skip_neg"))
def _gather_rows_impl(table, ids, chunk: int, skip_neg: bool):
    n_prog = ids.shape[0] // chunk
    d = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (chunk, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, chunk=chunk, skip_neg=skip_neg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ids.shape[0], d), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table)


def gather_rows_pallas(table: jax.Array, ids: jax.Array, chunk: int = _CHUNK,
                       skip_neg: bool = False) -> jax.Array:
    """table[[ids]] via explicit DMA. ids int32 [B]; B padded to `chunk`
    internally. Negative ids yield undefined rows (mask at the caller)."""
    B = ids.shape[0]
    chunk = min(chunk, max(64, B))
    Bp = cdiv(B, chunk) * chunk
    if Bp != B:
        ids = jnp.pad(ids, (0, Bp - B), constant_values=-1 if skip_neg else 0)
    out = _gather_rows_impl(table, ids.astype(jnp.int32), chunk, skip_neg)
    return out[:B]


def gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Runtime-dispatched row gather: Pallas DMA on TPU, XLA take elsewhere.
    Negative ids are clamped to row 0 (mask at the caller)."""
    # Mosaic rejects single-row HBM slices whose last dim is not a
    # multiple of the 128-lane tiling, so narrow tables take the XLA path
    if use_pallas() and table.shape[1] % 128 == 0:
        return gather_rows_pallas(table, ids)
    return jnp.take(table, jnp.maximum(ids, 0), axis=0)


# --------------------------------------------------------------------------
# Fused gather + distance: the beam search's hot step. Each query's
# candidate rows are DMA'd from HBM straight into VMEM scratch and scored
# there; gathered vectors never round-trip through HBM, and sentinel ids
# (-1: duplicates, padding, finished queries) issue NO DMA at all — the
# XLA take path must clamp and fetch them anyway.
# Replaces the gather half of `search_to_find_in_base_`
# (/root/reference/src/include/usearch/index.hpp:3929-3999), where the CPU
# cache hierarchy plays the role of these explicit copies.


def _gather_dist_kernel(
    ids_ref,      # scalar-prefetch: flat ids [B*C] (SMEM)
    ids_v_ref,    # same ids, blocked [QB, C] (VMEM) for masking
    q_ref,        # [QB, d] queries (PLANE order when packing > 1)
    qn_ref,       # [QB, 1] query squared norms
    table_ref,    # [N, d/packing] HBM (i32 words when packing > 1)
    out_ref,      # [QB, C] distances
    scratch,      # [QB*C, d/packing] VMEM
    sems,         # DMA semaphores
    *,
    qb: int,
    c: int,
    metric_name: str,
    packing: int,
):
    from vss_tpu.ops.distance import Metric

    metric = Metric.parse(metric_name)
    i = pl.program_id(0)
    base = i * qb * c
    total = qb * c

    def dma(j):
        row = ids_ref[base + j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(jnp.maximum(row, 0), 1), :],
            scratch.at[pl.ds(j, 1), :],
            sems.at[j % _NSEM],
        )

    def start(j):
        @pl.when(ids_ref[base + j] >= 0)
        def _():
            dma(j).start()

    def wait(j):
        @pl.when(ids_ref[base + j] >= 0)
        def _():
            dma(j).wait()

    for j in range(min(_NSEM, total)):
        start(j)

    def body(j, carry):
        wait(j)

        @pl.when(j + _NSEM < total)
        def _():
            start(j + _NSEM)

        return carry

    jax.lax.fori_loop(0, total, body, 0)

    # Decode the gathered rows into `packing` f32 planes of d/packing
    # lanes each. Distances only need sums over the d axis, which any
    # fixed permutation of d preserves — so planes are scored against a
    # query pre-permuted into the SAME plane order (done by the host
    # wrapper), and nothing is ever re-interleaved.
    w = scratch[:]
    if packing == 1:
        planes = [w.astype(jnp.float32)]
    elif packing == 2:  # bf16 pairs per i32 word: f32 = bits << 16
        lo = jax.lax.bitcast_convert_type(w << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            w & jnp.int32(-65536), jnp.float32
        )
        planes = [lo, hi]
    else:  # int8 quads per i32 word, sign-extended via (b ^ 128) - 128
        planes = []
        for k in range(4):
            b = (w >> (8 * k)) & jnp.int32(255)
            planes.append(((b ^ 128) - 128).astype(jnp.float32))

    dp = planes[0].shape[-1]
    qv = q_ref[:].astype(jnp.float32)
    # single full-width reduction: accumulating per-plane partial dots
    # (`dots += dot(...)`) folds into a reduction with a NON-constant
    # accumulator, which Mosaic rejects ("only constant accumulators
    # supported"); concatenating the decoded planes keeps one reduce with
    # a constant init. Plane order matches the host-permuted query.
    g = (
        planes[0].reshape(qb, c, dp)
        if len(planes) == 1
        else jnp.concatenate(
            [p.reshape(qb, c, dp) for p in planes], axis=2
        )
    )
    dots = jax.lax.dot_general(
        g, qv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    xn = (
        jnp.sum(g * g, axis=2)
        if metric != Metric.IP
        else jnp.zeros((qb, c), jnp.float32)
    )
    ok = ids_v_ref[:] >= 0
    if metric == Metric.IP:
        d = 1.0 - dots
    else:
        qn = qn_ref[:]  # [QB, 1]
        if metric == Metric.L2SQ:
            d = jnp.maximum(qn + xn - 2.0 * dots, 0.0)
        else:  # cosine
            denom = jnp.sqrt(qn * xn)
            cos = jnp.where(denom > 0.0, dots / jnp.where(denom > 0.0, denom, 1.0), 0.0)
            d = jnp.where((qn == 0.0) & (xn == 0.0), 0.0, 1.0 - cos)
    out_ref[:] = jnp.where(ok, d, jnp.float32(jnp.inf))


@functools.partial(
    jax.jit, static_argnames=("qb", "metric_name", "packing")
)
def _gather_distances_impl(table, ids, q, qn, qb: int, metric_name: str,
                           packing: int):
    B, C = ids.shape
    dw = table.shape[1]  # words per row (d / packing)
    d = dw * packing
    n_prog = B // qb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((qb, C), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (qb, C), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((qb * C, dw), table.dtype),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _gather_dist_kernel, qb=qb, c=C, metric_name=metric_name,
            packing=packing,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.reshape(-1).astype(jnp.int32), ids.astype(jnp.int32), q, qn, table)


def pack_table(table: jax.Array):
    """(packed_view, packing) for the fused kernel: f32 passes through;
    bf16/int8 rows are bit-packed into i32 words (a pure reinterpretation
    — do this ONCE per graph version and cache, the copy is tape-sized).
    The i32 word layout implies the plane order `plane_queries` uses.

    Mosaic constraint (measured on chip): a per-row DMA source slice must
    span a multiple of 128 lanes, so the packed word width d/packing must
    be 128-divisible — int8 needs d % 512 == 0, bf16 d % 256 == 0.
    Narrower tapes raise ValueError and callers fall back to the XLA
    gather path."""
    n, d = table.shape
    if table.dtype == jnp.float32:
        return table, 1
    if table.dtype == jnp.bfloat16:
        if (d // 2) % 128:
            raise ValueError("bf16 packed gather needs d % 256 == 0")
        w = jax.lax.bitcast_convert_type(table.reshape(n, d // 2, 2), jnp.int32)
        return w, 2
    if table.dtype == jnp.int8:
        if (d // 4) % 128:
            raise ValueError("int8 packed gather needs d % 512 == 0")
        w = jax.lax.bitcast_convert_type(table.reshape(n, d // 4, 4), jnp.int32)
        return w, 4
    raise ValueError(f"unsupported tape dtype {table.dtype}")


# --------------------------------------------------------------------------
# (A 4-row transpose-packed "group-fetch" DMA variant lived here in
# rounds 3-4: one descriptor per 4 candidates, attacking the per-row
# descriptor-issue ceiling at d=128 int8, where a 128-byte row is below
# Mosaic's 128-lane DMA minimum. Even after admitting only requested
# candidates it measured 3.4x SLOWER than plain take at equal eval
# counts (10.1k vs 34.1k qps at ef=32, BENCH_r04), so the path was
# deleted; finding recorded in docs/BENCH.md.)


def plane_queries(q: jax.Array, packing: int) -> jax.Array:
    """Permute the d axis into the kernel's plane order: byte/half k of
    each packed word forms plane k, so q[:, j*packing + k] moves to
    plane k, column j. Identity for packing == 1."""
    if packing == 1:
        return q
    B, d = q.shape
    return (
        q.reshape(B, d // packing, packing)
        .transpose(0, 2, 1)
        .reshape(B, d)
    )


def gather_distances_pallas(
    table: jax.Array,
    ids: jax.Array,
    q: jax.Array,
    metric,
    q_norms_sq=None,
    qb: int = int(_os.environ.get("VSS_GATHER_QB", "8")),
    packing: int = 1,
) -> jax.Array:
    """Fused `distances(q[b], table[ids[b, c]])` -> [B, C] f32; +inf where
    ids < 0. `table` is the raw f32 tape (packing=1) or a `pack_table`
    i32 word view (packing=2 bf16, 4 int8); q is always the unpacked f32
    query — the plane permutation happens here."""
    B, C = ids.shape
    q = plane_queries(q.astype(jnp.float32), packing)
    if q_norms_sq is None:
        q_norms_sq = jnp.sum(q * q, axis=-1)
    qn = q_norms_sq.astype(jnp.float32)[:, None]
    qb = min(qb, max(1, B))
    Bp = cdiv(B, qb) * qb
    if Bp != B:
        ids = jnp.pad(ids, ((0, Bp - B), (0, 0)), constant_values=-1)
        q = jnp.pad(q, ((0, Bp - B), (0, 0)))
        qn = jnp.pad(qn, ((0, Bp - B), (0, 0)))
    from vss_tpu.ops.distance import Metric

    out = _gather_distances_impl(
        table, ids, q, qn, qb, Metric.parse(metric).value, packing
    )
    return out[:B]
