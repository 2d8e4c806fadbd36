"""Query layer: rewrites, plan shapes, parity with unoptimized execution.

Mirrors the reference's SQLLogic test strategy (SURVEY §4): plan-shape
assertions via explain(), labeled-result equivalence between indexed and
brute-force execution, option binder errors, and the 729-grid result test.
"""
import numpy as np
import pytest

from vss_tpu import BinderError, Database, col, const, fn, vss_join, vss_match


def grid_729():
    g = np.stack(
        np.meshgrid(np.arange(9), np.arange(9), np.arange(9), indexing="ij"), -1
    ).reshape(-1, 3)
    return g.astype(np.float32)


@pytest.fixture
def db():
    d = Database()
    vecs = grid_729()
    d.create_table("items", {"id": np.arange(729, dtype=np.int64), "vec": vecs})
    d.create_hnsw_index("my_idx", "items", "vec", metric="l2sq", seed=0)
    return d


def dist_q(q):
    return fn("array_distance", col("vec"), const(np.asarray(q, np.float32)))


def test_topn_rewrites_to_index_scan(db):
    q = db.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    plan = q.explain()
    assert "HNSW_INDEX_SCAN" in plan
    assert "TOP_N" not in plan


def test_729_result_parity(db):
    """hnsw_result.test analog: distances 0, 1, 1 for [5,5,5] top-3."""
    q = (
        db.query("items")
        .order_by(dist_q([5, 5, 5]))
        .limit(3)
        .select("id", dist=dist_q([5, 5, 5]))
    )
    res = q.execute()
    np.testing.assert_allclose(sorted(res["dist"]), [0.0, 1.0, 1.0], atol=1e-6)
    assert res["id"][0] == 5 * 81 + 5 * 9 + 5


def test_indexed_matches_unoptimized(db):
    """Labeled-result equivalence (hnsw_rewrite.test analog)."""
    for target in ([1.0, 2.0, 3.0], [8.0, 8.0, 8.0], [4.4, 4.6, 4.5]):
        q = (
            db.query("items")
            .order_by(dist_q(target))
            .limit(5)
            .select("id", dist=dist_q(target))
        )
        with_idx = q.execute()
        no_idx = q.execute_unoptimized()
        np.testing.assert_allclose(
            with_idx["dist"], no_idx["dist"], atol=1e-5
        )


def test_no_index_uses_brute_force_kernel(db):
    """Un-indexed distance TopN lowers to the exact MXU operator."""
    db2 = Database()
    db2.create_table("t", {"id": np.arange(729), "vec": grid_729()})
    q = db2.query("t").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    assert "BRUTE_FORCE_TOPK" in q.explain()
    res = q.execute()
    assert res["id"][0] == 5 * 81 + 5 * 9 + 5


def test_descending_not_rewritten(db):
    q = (
        db.query("items")
        .order_by(dist_q([5, 5, 5]), ascending=False)
        .limit(3)
        .select("id")
    )
    assert "HNSW_INDEX_SCAN" not in q.explain()


def test_wrong_metric_not_rewritten(db):
    q = (
        db.query("items")
        .order_by(fn("array_cosine_distance", col("vec"), const(np.ones(3, np.float32))))
        .limit(3)
        .select("id")
    )
    assert "HNSW_INDEX_SCAN" not in q.explain()  # index is l2sq


def test_cosine_similarity_expr_rewrite():
    """(1 - cos_sim) -> cos_distance -> cosine index scan
    (hnsw_optimize_expr.cpp + hnsw_metrics.test analog)."""
    from vss_tpu.query.ir import BinOp

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((500, 8)).astype(np.float32)
    db = Database()
    db.create_table("t", {"id": np.arange(500), "vec": vecs})
    db.create_hnsw_index("cos_idx", "t", "vec", metric="cosine")
    target = rng.standard_normal(8).astype(np.float32)
    order = BinOp(
        "-", const(1.0), fn("array_cosine_similarity", col("vec"), const(target))
    )
    q = db.query("t").order_by(order).limit(5).select("id")
    assert "HNSW_INDEX_SCAN" in q.explain()
    res = q.execute()
    ref = q.execute_unoptimized()
    assert set(res["id"]) == set(ref["id"])


def test_filter_pullup(db):
    """Filters below the TopN are applied after the index scan
    (where_clause_segfault.test analog: may yield < k rows)."""
    from vss_tpu.query.ir import BinOp

    q = (
        db.query("items")
        .filter(BinOp(">", col("id"), const(100)))
        .order_by(dist_q([5, 5, 5]))
        .limit(3)
        .select("id")
    )
    plan = q.explain()
    assert "HNSW_INDEX_SCAN" in plan
    assert plan.index("FILTER") < plan.index("HNSW_INDEX_SCAN")
    res = q.execute()
    assert all(res["id"] > 100)


def test_min_by_rewrite(db):
    q = db.query("items").min_by(col("id"), dist_q([5, 5, 5]), 3)
    assert "HNSW_INDEX_SCAN" in q.explain()
    res = q.execute()
    ids = res["min_by"][0]
    assert ids[0] == 5 * 81 + 5 * 9 + 5
    assert len(ids) == 3


def test_knn_join_rewrite_and_parity(db, rng):
    queries = rng.uniform(0, 8, (10, 3)).astype(np.float32)
    db.create_table("queries", {"qid": np.arange(10), "qvec": queries})
    q = (
        db.query("queries")
        .knn_join("items", "vec", col("qvec"), k=3)
    )
    plan = q.explain()
    assert "HNSW_INDEX_JOIN" in plan
    res = q.execute()
    assert len(res["l_qid"]) == 30
    assert res["row_number"].max() == 3
    # parity vs brute-force fallback: compare per-rank distances, not ids —
    # the integer grid is full of exact ties, where any equidistant
    # neighbor is a correct answer (the reference's own tests avoid exact
    # row assertions for the same reason, SURVEY §4)
    ref = q.execute_unoptimized()

    def dists(r):
        d = r["r_vec"].astype(np.float64) - queries[r["l_qid"]].astype(np.float64)
        return np.sqrt((d * d).sum(-1))

    q2 = (
        db.query("queries")
        .knn_join("items", "vec", col("qvec"), k=3)
        .select("l_qid", "r_id", "r_vec", "row_number")
    )
    res = db.execute(q2.plan())
    ref = db.execute_unoptimized(q2.plan())
    np.testing.assert_allclose(dists(res), dists(ref), atol=1e-5)


def test_vss_macros(db, rng):
    queries = rng.uniform(0, 8, (5, 3)).astype(np.float32)
    db.create_table("queries", {"qid": np.arange(5), "qvec": queries})
    res = vss_join(db, "queries", "items", "qvec", "vec", k=2)
    assert len(res["left_qid"]) == 10
    assert np.all(np.diff(res["score"].reshape(5, 2), axis=1) >= 0)
    m = vss_match(db, "items", queries[0], "vec", k=4)
    assert len(m["id"]) == 4


def test_dml_maintains_index(db):
    new_ids = db.insert("items", {"id": [10000], "vec": [[20.0, 20.0, 20.0]]})
    q = db.query("items").order_by(dist_q([20, 20, 20])).limit(1).select("id")
    assert "HNSW_INDEX_SCAN" in q.explain()
    assert q.execute()["id"][0] == 10000
    db.delete("items", new_ids)
    assert q.execute()["id"][0] != 10000
    # update = delete + insert
    target = 5 * 81 + 5 * 9 + 5
    rid = db.table("items").rowids[target]
    db.update("items", [rid], {"vec": np.asarray([[30.0, 30.0, 30.0]], np.float32)})
    r = db.query("items").order_by(dist_q([30, 30, 30])).limit(1).select("id").execute()
    # the id column keeps its original value through the delete+insert
    assert r["id"][0] == target


def test_option_binder_errors():
    db = Database()
    db.create_table("t", {"vec": np.ones((10, 4), np.float32)})
    cases = [
        (dict(metric="invalid"), "HNSW index 'metric' must be one of: 'l2sq', 'cosine', 'ip'"),
        (dict(ef_construction="x"), "HNSW index 'ef_construction' must be an integer"),
        (dict(ef_construction=0), "HNSW index 'ef_construction' must be at least 1"),
        (dict(ef_search="x"), "HNSW index 'ef_search' must be an integer"),
        (dict(ef_search=-1), "HNSW index 'ef_search' must be at least 1"),
        (dict(m="x"), "HNSW index 'M' must be an integer"),
        (dict(m=1), "HNSW index 'M' must be at least 2"),
        (dict(m0="x"), "HNSW index 'M0' must be an integer"),
        (dict(m0=1), "HNSW index 'M0' must be at least 2"),
    ]
    for kwargs, msg in cases:
        with pytest.raises(BinderError) as e:
            db.create_hnsw_index("i", "t", "vec", **kwargs)
        assert msg in str(e.value), (kwargs, str(e.value))
    with pytest.raises(BinderError, match="FLOAT"):
        db.create_table("s", {"x": np.arange(10)})
        db.create_hnsw_index("i", "s", "x")


def test_persistence_gate(tmp_path):
    db = Database(path=str(tmp_path / "db"))
    db.create_table("t", {"vec": np.ones((10, 4), np.float32)})
    with pytest.raises(BinderError, match="hnsw_enable_experimental_persistence"):
        db.create_hnsw_index("i", "t", "vec")
    db.set_setting("hnsw_enable_experimental_persistence", True)
    db.create_hnsw_index("i", "t", "vec")


def test_ef_search_setting(db):
    db.set_setting("hnsw_ef_search", 256)
    q = db.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    res = q.execute()
    assert res["id"][0] == 5 * 81 + 5 * 9 + 5
    with pytest.raises(BinderError):
        db.set_setting("nonexistent", 1)


def test_index_info_pragma(db):
    info = db.hnsw_index_info()
    assert len(info) == 1
    assert info[0]["index_name"] == "my_idx"
    assert info[0]["count"] == 729
    assert info[0]["metric"] == "l2sq"


def test_compact_pragma(db):
    db.delete("items", list(range(50)))
    db.hnsw_compact_index("my_idx")
    e = db.indexes["my_idx"]
    assert e.index.deleted_count == 0
    q = db.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    assert q.execute()["id"][0] == 5 * 81 + 5 * 9 + 5
    with pytest.raises(BinderError, match="does not exist"):
        db.hnsw_compact_index("nope")


def test_database_checkpoint_roundtrip(db, tmp_path):
    db.set_setting("hnsw_enable_experimental_persistence", True)
    path = str(tmp_path / "ckpt")
    db.checkpoint(path)
    db2 = Database.open(path)
    assert "my_idx" in db2.indexes
    q = db2.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    assert "HNSW_INDEX_SCAN" in q.explain()
    assert q.execute()["id"][0] == 5 * 81 + 5 * 9 + 5


def test_explain_analyze(db):
    q = db.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    report, result = db.explain_analyze(q.plan())
    assert "HNSW_INDEX_SCAN" in report
    assert "ms," in report and "rows]" in report
    assert result["id"][0] == 5 * 81 + 5 * 9 + 5
    # SQL surface
    r = db.sql(
        "EXPLAIN ANALYZE SELECT id FROM items "
        "ORDER BY array_distance(vec, [5.0,5.0,5.0]) LIMIT 3"
    )
    assert "HNSW_INDEX_SCAN" in r["explain"][0]


def test_search_stats(db):
    from vss_tpu.index.search import hnsw_search
    import jax.numpy as jnp

    e = db.indexes["my_idx"]
    d, i, stats = hnsw_search(
        e.index.graph, e.index.config, jnp.asarray([[5.0, 5.0, 5.0]]), k=3,
        with_stats=True,
    )
    assert stats["iterations"] > 0
    assert stats["distance_evals"] > 0


def test_filter_pushdown_setting(db):
    """With hnsw_pushdown_filters on, the scan returns k rows that all
    match the predicate (unlike the reference's post-filter)."""
    from vss_tpu.query.ir import BinOp

    db.set_setting("hnsw_pushdown_filters", True)
    q = (
        db.query("items")
        .filter(BinOp(">", col("id"), const(700)))
        .order_by(dist_q([5, 5, 5]))
        .limit(3)
        .select("id")
    )
    plan = q.explain()
    assert "filtered" in plan
    res = q.execute()
    assert len(res["id"]) == 3          # full k despite the selective filter
    assert all(res["id"] > 700)
    # parity: must equal exact filtered brute force
    ref = q.execute_unoptimized()
    assert set(res["id"]) == set(ref["id"])


def test_metric_routing_multiple_indexes(rng):
    """hnsw_metrics.test analog: one index per metric on the same column;
    each distance function must route to the matching index."""
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    db = Database()
    db.create_table("t", {"id": np.arange(300), "vec": vecs})
    db.create_hnsw_index("idx_l2", "t", "vec", metric="l2sq")
    db.create_hnsw_index("idx_cos", "t", "vec", metric="cosine")
    db.create_hnsw_index("idx_ip", "t", "vec", metric="ip")
    target = const(rng.standard_normal(8).astype(np.float32))
    cases = [
        ("array_distance", "idx_l2"),
        ("array_cosine_distance", "idx_cos"),
        ("array_negative_inner_product", "idx_ip"),
    ]
    for fname, idx_name in cases:
        q = db.query("t").order_by(fn(fname, col("vec"), target)).limit(3).select("id")
        plan = q.explain()
        assert idx_name in plan, (fname, plan)
    # similarity (not a distance) must NOT be rewritten
    q = db.query("t").order_by(
        fn("array_cosine_similarity", col("vec"), target)
    ).limit(3).select("id")
    assert "HNSW_INDEX_SCAN" not in q.explain()


def test_knn_join_with_null_vectors(db, rng):
    """hnsw_lateral_join.test 'with nulls' analog: NULL outer vectors
    produce no matches; NULL inner rows are never matched."""
    queries = rng.uniform(0, 8, (4, 3)).astype(np.float32)
    db.create_table("queries", {"qid": np.arange(4), "qvec": queries})
    # NULL an outer row
    db.table("queries").columns["qvec"][2] = np.nan
    db.table("queries")._bump()
    q = db.query("queries").knn_join("items", "vec", col("qvec"), k=2)
    res = q.execute()
    assert 2 not in set(res["l_qid"].tolist())      # null outer -> no rows
    assert len(res["l_qid"]) == 6                   # 3 live outers x 2
    # same through the brute-force fallback
    ref = q.execute_unoptimized()
    assert 2 not in set(ref["l_qid"].tolist())
    assert len(ref["l_qid"]) == 6
