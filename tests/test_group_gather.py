"""Group-fetch gather kernel (ops/gather.pack_group_table +
group_distances_pallas) vs oracle, interpret mode. Real lowering is
exercised on-chip by the bench and benchmarks/bench_search_ab.py."""
import functools

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental import pallas as pl

import vss_tpu.ops.gather as gather_mod
from vss_tpu.ops.gather import (
    group_candidate_ids,
    group_distances_pallas,
    pack_group_table,
)


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        gather_mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
    gather_mod._group_distances_impl.clear_cache()
    yield
    gather_mod._group_distances_impl.clear_cache()


def _oracle(q, vecs, metric):
    dots = np.einsum("bcd,bd->bc", vecs, q)
    if metric == "ip":
        return 1.0 - dots
    qn = (q * q).sum(-1)[:, None]
    xn = (vecs * vecs).sum(-1)
    if metric == "l2sq":
        return np.maximum(qn + xn - 2 * dots, 0)
    den = np.sqrt(qn * xn)
    cos = np.where(den > 0, dots / np.where(den > 0, den, 1), 0)
    return np.where((qn == 0) & (xn == 0), 0.0, 1.0 - cos)


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
@pytest.mark.parametrize("d", [128, 96])  # 96 pads to 128 words
def test_group_distances(interpret_pallas, metric, d):
    rng = np.random.default_rng(2)
    B, Cg, n = 8, 12, 512
    table_np = rng.integers(-100, 100, (n, d)).astype(np.int8)
    grouped, G = pack_group_table(jnp.asarray(table_np))
    assert G == 4 and grouped.shape == (n // 4, ((d + 127) // 128) * 128)
    q = rng.normal(size=(B, d)).astype(np.float32) * 10
    gids = rng.integers(0, n // 4, (B, Cg)).astype(np.int32)
    gids[0, :3] = -1  # sentinels: no DMA, +inf out
    out, _ = group_distances_pallas(
        grouped, jnp.asarray(gids), jnp.asarray(q), metric
    )
    out = np.asarray(out)
    ids = np.asarray(group_candidate_ids(jnp.asarray(gids), G))
    assert out.shape == (B, G * Cg) and ids.shape == (B, G * Cg)
    # candidate m = row gids[:, m % Cg]*G + m // Cg (plane-major)
    safe = np.maximum(ids, 0)
    oracle = _oracle(q, table_np.astype(np.float32)[safe], metric)
    oracle[ids < 0] = np.inf
    mask = np.isfinite(oracle)
    np.testing.assert_allclose(out[mask], oracle[mask], rtol=5e-4, atol=2e-3)
    assert not np.isfinite(out[0, :3]).any()
    assert not np.isfinite(out[0, Cg : Cg + 3]).any()  # other planes too


def test_group_search_end_to_end(interpret_pallas, monkeypatch):
    """Beam search with group_tape matches plain search's recall on a
    small corpus (extra slot-adjacent candidates can only help)."""
    import vss_tpu.utils as utils

    monkeypatch.setattr(utils, "use_pallas", lambda: True)
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.index.graph import HNSWConfig
    from vss_tpu.index.search import hnsw_search
    from vss_tpu.ops.topk import bruteforce_topk

    rng = np.random.default_rng(5)
    n, d, k = 800, 32, 5
    vecs = rng.integers(0, 120, (n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric="l2sq", storage_dtype="int8")
    idx = HNSWIndex.build(vecs, cfg, method="wave")
    q = vecs[rng.integers(0, n, 16)] + rng.normal(0, 2, (16, d)).astype(
        np.float32
    )
    qs = jnp.asarray(q / idx.vector_scale)
    gt = np.asarray(
        bruteforce_topk(qs, idx.graph.vectors.astype(jnp.float32), k, "l2sq",
                        valid_mask=idx.graph.valid)[1]
    )
    gtape, G = idx.grouped_tape()
    assert gtape is not None
    _, slots = hnsw_search(
        idx.graph, idx.config, qs, k, ef=32, group_tape=gtape, group=G,
        rerank_tape=idx.rerank_tape,
    )
    slots = np.asarray(slots)
    rec = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(slots, gt)
    ])
    assert rec >= 0.9, rec
