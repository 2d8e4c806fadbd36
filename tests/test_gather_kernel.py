"""Fused gather+score kernel (ops/gather.py) vs oracle, interpret mode.

Covers the packed i32 word views (bf16 packing=2, int8 packing=4) that
the real-TPU fused beam path uses for sub-word tapes.
"""
import functools

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental import pallas as pl

import vss_tpu.ops.gather as gather_mod
from vss_tpu.ops.gather import (
    gather_distances_pallas,
    gather_rows_pallas,
    pack_table,
)


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        gather_mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
    gather_mod._gather_rows_impl.clear_cache()
    gather_mod._gather_distances_impl.clear_cache()
    yield
    gather_mod._gather_rows_impl.clear_cache()
    gather_mod._gather_distances_impl.clear_cache()


def _oracle(q, xg, metric):
    dots = np.einsum("bd,bcd->bc", q, xg)
    if metric == "ip":
        return 1.0 - dots
    qn = (q * q).sum(1)[:, None]
    xn = (xg * xg).sum(2)
    if metric == "l2sq":
        return np.maximum(qn + xn - 2 * dots, 0)
    den = np.sqrt(qn * xn)
    cos = np.where(den > 0, dots / np.where(den > 0, den, 1), 0)
    return np.where((qn == 0) & (xn == 0), 0.0, 1.0 - cos)


def test_gather_rows(interpret_pallas):
    rng = np.random.default_rng(0)
    table = rng.normal(size=(300, 128)).astype(np.float32)
    ids = rng.integers(0, 300, 96).astype(np.int32)
    out = np.asarray(gather_rows_pallas(jnp.asarray(table), jnp.asarray(ids)))
    np.testing.assert_array_equal(out, table[ids])


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
@pytest.mark.parametrize("dtype,packing,d", [
    (np.float32, 1, 128), (jnp.bfloat16, 2, 256), (np.int8, 4, 512),
])
def test_gather_distances_packed(interpret_pallas, metric, dtype, packing, d):
    rng = np.random.default_rng(1)
    B, C, n = 16, 24, 400
    if dtype is np.int8:
        table_np = rng.integers(-100, 100, (n, d)).astype(np.int8)
        table = jnp.asarray(table_np)
        table_f = table_np.astype(np.float32)
    else:
        table_f = rng.normal(size=(n, d)).astype(np.float32)
        table = jnp.asarray(table_f, dtype=dtype)
        table_f = np.asarray(table.astype(jnp.float32))  # tape-rounded oracle
    q = rng.normal(size=(B, d)).astype(np.float32) * 10
    ids = rng.integers(0, n, (B, C)).astype(np.int32)
    ids[0, :4] = -1  # sentinels cost no DMA and return +inf
    packed, p = pack_table(table)
    assert p == packing
    out = np.asarray(gather_distances_pallas(
        packed, jnp.asarray(ids), jnp.asarray(q), metric, packing=p,
    ))
    oracle = _oracle(q, table_f[np.maximum(ids, 0)], metric)
    oracle[ids < 0] = np.inf
    mask = np.isfinite(oracle)
    # int8 dots reach ~1e5; different summation orders differ by ~1e-3
    np.testing.assert_allclose(out[mask], oracle[mask], rtol=5e-4, atol=2e-3)
    assert not np.isfinite(out[0, :4]).any()


def test_pack_table_rejects_narrow_rows():
    """Sub-128-lane packed rows violate Mosaic DMA alignment: pack_table
    must refuse so callers fall back to the XLA gather path."""
    with pytest.raises(ValueError):
        pack_table(jnp.zeros((8, 128), jnp.int8))
    with pytest.raises(ValueError):
        pack_table(jnp.zeros((8, 128), jnp.bfloat16))
