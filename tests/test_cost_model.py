"""Hybrid planner: cost-based index-vs-exact-scan choice (query/cost.py).

No reference counterpart — the reference always picks the index
(`hnsw_optimize_scan.cpp`). Off by default (plan shapes stay
reference-parity); `SET hnsw_cost_model = true` enables it.
"""
import numpy as np
import pytest

from vss_tpu import Database, col, const, fn
from vss_tpu.query.cost import prefer_exact


def grid_729():
    g = np.stack(
        np.meshgrid(np.arange(9), np.arange(9), np.arange(9), indexing="ij"), -1
    ).reshape(-1, 3)
    return g.astype(np.float32)


def dist_q(q):
    return fn("array_distance", col("vec"), const(np.asarray(q, np.float32)))


@pytest.fixture
def db():
    d = Database()
    d.create_table("items", {"id": np.arange(729, dtype=np.int64), "vec": grid_729()})
    d.create_hnsw_index("my_idx", "items", "vec", metric="l2sq", seed=0)
    d.create_table(
        "queries", {"qid": np.arange(8, dtype=np.int64), "vec": grid_729()[:8]}
    )
    return d


def test_model_matches_flagship_measurements():
    """The fitted model must reproduce the measured regime boundaries
    (docs/BENCH.md): at 1M x 128 f32 the graph wins single queries, the
    exact scan wins 512-query batches; tiny corpora always prefer exact."""
    assert not prefer_exact(1_000_000, 128, 4, n_queries=1, ef=64, m0=32)
    assert prefer_exact(1_000_000, 128, 4, n_queries=512, ef=64, m0=32)
    assert prefer_exact(729, 3, 4, n_queries=1, ef=64, m0=32)


def test_topn_flips_to_exact_on_tiny_corpus(db):
    q = db.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    assert "HNSW_INDEX_SCAN" in q.explain()  # default: reference parity
    db.set_setting("hnsw_cost_model", True)
    plan = q.explain()
    assert "BRUTE_FORCE_TOPK" in plan and "HNSW_INDEX_SCAN" not in plan
    res = q.execute()
    assert res["id"][0] == 5 * 81 + 5 * 9 + 5


def test_join_flips_to_exact_and_results_match(db):
    q = (
        db.query("queries")
        .knn_join("items", "vec", col("vec"), 3)
        .select("row_number", qid=col("l_qid"), rid=col("r_id"))
    )
    assert "HNSW_INDEX_JOIN" in q.explain()
    indexed = q.execute()
    db.set_setting("hnsw_cost_model", True)
    assert "HNSW_INDEX_JOIN" not in q.explain()
    exact = q.execute()
    # exact results are a valid (>=) answer: same ids for a grid with
    # unique distances per query point
    np.testing.assert_array_equal(indexed["qid"], exact["qid"])
    np.testing.assert_array_equal(indexed["rid"][::3], exact["rid"][::3])


def test_sql_surface(db):
    db.sql("SET hnsw_cost_model = true")
    out = db.sql("EXPLAIN SELECT id FROM items ORDER BY array_distance(vec, [5.0, 5.0, 5.0]) LIMIT 3")
    text = str(out)
    assert "BRUTE_FORCE_TOPK" in text
