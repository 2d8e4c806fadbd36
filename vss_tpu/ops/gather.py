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
_NSEM = 32


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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
    if use_pallas():
        return gather_rows_pallas(table, ids)
    return jnp.take(table, jnp.maximum(ids, 0), axis=0)
