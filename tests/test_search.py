"""Batched beam search correctness against brute force, on graphs built by
the trusted host-side sequential builder."""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig, hnsw_search
from vss_tpu.index.host_build import build_host_graph, host_graph_to_device
from vss_tpu.ops import bruteforce_topk


def grid_729():
    """The reference README's 729-row FLOAT[3] grid (test/sql/hnsw/
    hnsw_result.test:9-28): all (x, y, z) in [0, 9)^3."""
    g = np.stack(
        np.meshgrid(np.arange(9), np.arange(9), np.arange(9), indexing="ij"), -1
    ).reshape(-1, 3)
    return g.astype(np.float32)


def recall(ids, true_ids):
    hits = 0
    for a, b in zip(ids, true_ids):
        hits += len(set(a[a >= 0]) & set(b[b >= 0]))
    return hits / true_ids[true_ids >= 0].size


@pytest.fixture(scope="module")
def grid_graph():
    vecs = grid_729()
    cfg = HNSWConfig(dims=3, metric="l2sq")
    g = build_host_graph(vecs, cfg, seed=0)
    return host_graph_to_device(g), cfg, vecs


def test_729_grid_exact_top3(grid_graph):
    graph, cfg, vecs = grid_graph
    # reference query: [5, 5, 5] -> distances 0, 1, 1 (hnsw_result.test:23-28)
    q = jnp.asarray([[5.0, 5.0, 5.0]])
    d, i = hnsw_search(graph, cfg, q, k=3)
    d = np.asarray(d)[0]
    np.testing.assert_allclose(d, [0.0, 1.0, 1.0], atol=1e-6)
    assert np.asarray(i)[0, 0] == 5 * 81 + 5 * 9 + 5


def test_729_grid_full_recall(grid_graph):
    graph, cfg, vecs = grid_graph
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(0, 9, (32, 3)).astype(np.float32))
    d, i = hnsw_search(graph, cfg, q, k=10)
    bd, bi = bruteforce_topk(q, jnp.asarray(vecs), 10, "l2sq")
    r = recall(np.asarray(i), np.asarray(bi))
    assert r >= 0.99, f"recall {r}"
    # distances must match brute force for the hits
    np.testing.assert_allclose(np.asarray(d)[:, 0], np.asarray(bd)[:, 0], atol=1e-5)


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
def test_random_2k_recall(rng, metric):
    n, d, k = 2000, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric=metric)
    g = build_host_graph(vecs, cfg, seed=0)
    graph = host_graph_to_device(g)
    q = jnp.asarray(rng.standard_normal((50, d)).astype(np.float32))
    sd, si = hnsw_search(graph, cfg, q, k=k, ef=64)
    bd, bi = bruteforce_topk(q, jnp.asarray(vecs), k, metric)
    r = recall(np.asarray(si), np.asarray(bi))
    assert r >= 0.95, f"{metric} recall {r}"


def test_filter_mask(grid_graph):
    graph, cfg, vecs = grid_graph
    q = jnp.asarray([[5.0, 5.0, 5.0]])
    # exclude the exact match slot
    mask = np.ones(graph.capacity, bool)
    mask[5 * 81 + 5 * 9 + 5] = False
    d, i = hnsw_search(graph, cfg, q, k=3, filter_mask=jnp.asarray(mask))
    assert 5 * 81 + 5 * 9 + 5 not in np.asarray(i)[0]
    np.testing.assert_allclose(np.asarray(d)[0, 0], 1.0, atol=1e-6)


def test_tombstone_excluded_but_routable(grid_graph):
    graph, cfg, vecs = grid_graph
    target = 5 * 81 + 5 * 9 + 5
    tomb = graph.valid.at[target].set(False)
    import dataclasses

    g2 = dataclasses.replace(graph, valid=tomb, count=graph.count - 1)
    q = jnp.asarray([[5.0, 5.0, 5.0]])
    d, i = hnsw_search(g2, cfg, q, k=3)
    ids = np.asarray(i)[0]
    assert target not in ids
    np.testing.assert_allclose(np.asarray(d)[0, 0], 1.0, atol=1e-6)


def test_expand_gt_one_matches(rng):
    n, d, k = 1000, 16, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d)
    g = build_host_graph(vecs, cfg, seed=0)
    graph = host_graph_to_device(g)
    q = jnp.asarray(rng.standard_normal((20, d)).astype(np.float32))
    bd, bi = bruteforce_topk(q, jnp.asarray(vecs), k, "l2sq")
    for expand in (1, 4):
        sd, si = hnsw_search(graph, cfg, q, k=k, ef=64, expand=expand)
        r = recall(np.asarray(si), np.asarray(bi))
        assert r >= 0.95, f"expand={expand} recall {r}"


def test_empty_graph():
    from vss_tpu.index import empty_graph

    cfg = HNSWConfig(dims=4)
    graph = empty_graph(cfg, 16)
    d, i = hnsw_search(graph, cfg, jnp.zeros((2, 4)), k=3)
    assert np.all(np.asarray(i) == -1)
    assert np.all(np.isinf(np.asarray(d)))
