"""MXU bulk builder (`index/exact_build.py`) + connectivity repair.

The exact builder is the bulk CREATE INDEX path on TPU (SURVEY §3.1
analog of `hnsw_index_physical_create.cpp`); these tests pin its
contract on the CPU backend: recall vs the brute-force oracle,
determinism, the bf16 distance-matrix variant, hierarchy routing
without pivot seeding, and the reachability repair pass.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig, hnsw_search
from vss_tpu.index.dense import HNSWIndex
from vss_tpu.index.exact_build import build_graph_exact, exact_knn
from vss_tpu.index.repair import reachable_mask, repair_connectivity
from vss_tpu.ops import bruteforce_topk


def recall(ids, true_ids):
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(ids, true_ids)
    )
    return hits / true_ids[true_ids >= 0].size


@pytest.mark.parametrize("metric", ["l2sq", "cosine"])
def test_exact_build_recall(rng, metric):
    n, d, k = 4000, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric=metric)
    graph, _ = build_graph_exact(vecs, cfg)
    assert int(graph.count) == n
    q = jnp.asarray(rng.standard_normal((64, d)).astype(np.float32))
    sd, si = hnsw_search(graph, cfg, q, k=k, ef=64)
    rows = np.asarray(jnp.take(graph.slot_to_rowid, jnp.maximum(si, 0)))
    rows = np.where(np.asarray(si) >= 0, rows, -1)
    _, bi = bruteforce_topk(q, jnp.asarray(vecs), k, metric)
    r = recall(rows, np.asarray(bi))
    assert r >= 0.92, f"{metric} recall {r}"


def test_exact_build_deterministic(rng):
    vecs = rng.standard_normal((1200, 16)).astype(np.float32)
    cfg = HNSWConfig(dims=16, metric="l2sq")
    g1, u1 = build_graph_exact(vecs, cfg, seed=7)
    g2, u2 = build_graph_exact(vecs, cfg, seed=7)
    assert u1 == u2
    np.testing.assert_array_equal(np.asarray(g1.adj0), np.asarray(g2.adj0))
    np.testing.assert_array_equal(np.asarray(g1.levels), np.asarray(g2.levels))


def test_exact_knn_matches_oracle(rng):
    n, d, C = 700, 24, 8
    vecs = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ids = jnp.arange(n, dtype=jnp.int32)
    _, ki = exact_knn(vecs, ids, C, "l2sq")
    # oracle: top C+1 contains self at rank 0 (distance 0)
    _, oi = bruteforce_topk(vecs, vecs, C + 1, "l2sq")
    ki, oi = np.asarray(ki), np.asarray(oi)
    for r in range(0, n, 97):
        want = [i for i in oi[r].tolist() if i != r][:C]
        assert ki[r].tolist() == want


def test_exact_knn_bf16_distances(rng):
    """The TPU default (bf16 distance matrix) must keep near-oracle
    candidate quality; exercised explicitly since CPU defaults to f32."""
    n, d, C = 1500, 32, 16
    vecs = jnp.asarray(
        (rng.standard_normal((n, d)) * 20).astype(np.float32)
    )
    ids = jnp.arange(n, dtype=jnp.int32)
    _, ki16 = exact_knn(vecs, ids, C, "l2sq", dist_bf16=True)
    _, ki32 = exact_knn(vecs, ids, C, "l2sq", dist_bf16=False)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / C
        for a, b in zip(np.asarray(ki16), np.asarray(ki32))
    ])
    assert overlap >= 0.95, overlap


def test_exact_build_greedy_descent_routing(rng):
    """Upper levels must route a plain greedy descent (no pivot seeding)
    to good seeds — the CPU/incremental search path."""
    n, d, k = 4000, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric="l2sq")
    graph, _ = build_graph_exact(vecs, cfg)
    q = jnp.asarray(rng.standard_normal((32, d)).astype(np.float32))
    sd, si = hnsw_search(graph, cfg, q, k=k, ef=64)  # no pivots passed
    rows = np.asarray(jnp.take(graph.slot_to_rowid, jnp.maximum(si, 0)))
    rows = np.where(np.asarray(si) >= 0, rows, -1)
    _, bi = bruteforce_topk(q, jnp.asarray(vecs), k, "l2sq")
    assert recall(rows, np.asarray(bi)) >= 0.9


def test_ivf_candidates_quality(rng):
    """The locality-blocked candidate pass (index/ivf_candidates.py) must
    produce near-exact top-C lists: high overlap with the exact pass and
    identical nearest-1 hits on clustered data."""
    from vss_tpu.index.ivf_candidates import ivf_candidates

    n, d, C = 6000, 24, 16
    centers = rng.standard_normal((30, d)).astype(np.float32) * 8
    vecs = (
        centers[rng.integers(0, 30, n)]
        + rng.standard_normal((n, d)).astype(np.float32)
    )
    ids = jnp.arange(n, dtype=jnp.int32)
    xv = jnp.asarray(vecs)
    _, ei = exact_knn(xv, ids, C, "l2sq")
    _, ii = ivf_candidates(xv, ids, C, "l2sq", window=128, probes=8, seed=3)
    ei, ii = np.asarray(ei), np.asarray(ii)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / C
        for a, b in zip(ei, ii)
    ])
    assert overlap >= 0.85, overlap
    # ascending distances, no self, no duplicates within a row
    _, di = ivf_candidates(xv, ids, C, "l2sq", window=128, probes=8, seed=3)
    assert (np.asarray(di) == ii).all()  # deterministic given seed
    for r in range(0, n, 613):
        row = ii[r][ii[r] >= 0]
        assert r not in row.tolist()
        assert len(set(row.tolist())) == row.size


def test_ivf_build_recall(rng):
    """End-to-end: graph built from IVF candidates must hold the same
    recall bar as the exact-candidate build."""
    n, d, k = 4000, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric="l2sq")
    graph, _ = build_graph_exact(vecs, cfg, candidate_mode="ivf")
    assert int(graph.count) == n
    q = jnp.asarray(rng.standard_normal((64, d)).astype(np.float32))
    sd, si = hnsw_search(graph, cfg, q, k=k, ef=64)
    rows = np.asarray(jnp.take(graph.slot_to_rowid, jnp.maximum(si, 0)))
    rows = np.where(np.asarray(si) >= 0, rows, -1)
    _, bi = bruteforce_topk(q, jnp.asarray(vecs), k, "l2sq")
    r = recall(rows, np.asarray(bi))
    assert r >= 0.9, f"ivf-build recall {r}"


def test_repair_bridges_disconnected_clusters(rng):
    """Two well-separated clusters: pure-kNN edges cannot connect them;
    repair must make every occupied slot reachable and search must find
    far-cluster neighbors."""
    a = rng.normal(0, 1, (900, 16)).astype(np.float32)
    b = rng.normal(80, 1, (900, 16)).astype(np.float32)
    vecs = np.concatenate([a, b])
    cfg = HNSWConfig(dims=16, metric="l2sq")
    idx = HNSWIndex.build(vecs, cfg, method="exact")
    m = np.asarray(reachable_mask(idx.graph))
    assert int(m.sum()) == 1800
    q = rng.normal(80, 1, (8, 16)).astype(np.float32)
    _, bi = bruteforce_topk(jnp.asarray(q), jnp.asarray(vecs), 10, "l2sq")
    _, rows = idx.search(q, k=10)
    assert recall(np.asarray(rows), np.asarray(bi)) >= 0.9


def test_repair_noop_on_connected_graph(rng):
    vecs = rng.standard_normal((1000, 16)).astype(np.float32)
    cfg = HNSWConfig(dims=16, metric="l2sq")
    graph, _ = build_graph_exact(vecs, cfg)
    g2, n_bridged = repair_connectivity(graph, cfg)
    assert n_bridged == 0
    np.testing.assert_array_equal(np.asarray(graph.adj0), np.asarray(g2.adj0))


def test_ivf_score_groups_bf16_arm(rng):
    """The bf16 scoring arm of the candidate pass (enabled on TPU) must
    trace (f32 output contract despite bf16 selection — ADVICE r2) and
    keep near-exact top-C overlap with the f32 arm."""
    import jax.numpy as jnp

    from vss_tpu.index.ivf_candidates import _score_groups
    from vss_tpu.utils import round_up

    W, window, d, probes, C = 16, 64, 16, 4, 8
    tape = rng.standard_normal((W, window, d)).astype(np.float32)
    gids = np.arange(W * window, dtype=np.int32).reshape(W, window)
    cents = tape.mean(axis=1)
    dm = ((cents[:, None] - cents[None, :]) ** 2).sum(-1)
    nbr = np.argsort(dm, axis=1)[:, :probes].astype(np.int32)
    args = (jnp.asarray(gids), jnp.asarray(nbr), C, "l2sq", 8, window, probes)
    d32, i32_ = _score_groups(jnp.asarray(tape), *args, score_bf16=False)
    d16, i16_ = _score_groups(
        jnp.asarray(tape, jnp.bfloat16), *args, score_bf16=True
    )
    assert d16.dtype == jnp.float32  # output contract survives bf16 scoring
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / C
        for a, b in zip(np.asarray(i32_), np.asarray(i16_))
    ])
    assert overlap >= 0.9, overlap


def test_scan_candidates_matches_exact_knn():
    """The storage-native candidate pass (round-4 'scan' mode) must
    reproduce exact_knn's lists: same ids (self excluded), ascending
    exact distances. On CPU scan_topk falls back to the bruteforce
    oracle, so this pins the contract (batching, self-masking, -1s);
    the TPU kernel path is A/B'd by benchmarks/iid_ladder.py."""
    import jax.numpy as jnp

    from vss_tpu.index.exact_build import exact_knn, scan_candidates

    rng = np.random.default_rng(3)
    n, d, C = 3000, 24, 16
    xv = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ids = jnp.arange(n, dtype=jnp.int32)
    ed, ei = exact_knn(xv, ids, C, "l2sq", fast_matmul=False)
    sd, si = scan_candidates(
        xv, xv, jnp.ones((n,), jnp.bool_),
        jnp.sum(xv * xv, axis=1), C + 1, "l2sq", batch=1024,
    )
    ed, ei = np.asarray(ed), np.asarray(ei)
    sd, si = np.asarray(sd), np.asarray(si)
    # scan requested C+1 (self occupies one slot); drop self/-1 and
    # compare the first C survivors per row
    for r in range(0, n, 197):
        live = si[r][si[r] >= 0][:C]
        np.testing.assert_array_equal(live, ei[r][:C])
    # distances ascending within finite prefix
    f = np.where(si >= 0, sd, np.inf)
    srt = np.sort(f, axis=1)
    np.testing.assert_allclose(np.sort(f, axis=1)[:, :C], srt[:, :C])


def test_build_graph_exact_scan_mode_cpu_fallback(monkeypatch):
    """VSS_CAND_MODE=scan end-to-end on CPU (oracle fallback): search
    recall matches the exact mode within noise."""
    import jax.numpy as jnp

    from vss_tpu.index import HNSWConfig
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.ops import bruteforce_topk

    rng = np.random.default_rng(4)
    n, d, k = 4000, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((48, d)).astype(np.float32)
    gt = np.asarray(
        bruteforce_topk(jnp.asarray(q), jnp.asarray(vecs), k, "l2sq")[1]
    )
    monkeypatch.setenv("VSS_CAND_MODE", "scan")
    idx = HNSWIndex.build(vecs, HNSWConfig(dims=d), method="exact")
    _, rows = idx.search(q, k=k, ef=96)
    rows = np.asarray(rows)
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b.tolist()))
        for a, b in zip(rows, gt)
    )
    assert hits / (48 * k) >= 0.9
