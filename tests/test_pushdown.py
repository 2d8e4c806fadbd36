"""Projection pushdown + device-side filter masks + macro score parity."""
import numpy as np
import pytest

from vss_tpu import Database


@pytest.fixture
def db(rng):
    d = Database()
    d.sql("CREATE TABLE t (id BIGINT, name VARCHAR, vec FLOAT[4], extra FLOAT)")
    n = 300
    d.insert(
        "t",
        {
            "id": np.arange(n),
            "name": np.asarray([f"row{i}" for i in range(n)], object),
            "vec": rng.standard_normal((n, 4)).astype(np.float32),
            "extra": rng.standard_normal(n),
        },
    )
    return d


def test_projection_pushdown_plan_and_result(db):
    """The analog of hnsw_projection.test: an index scan under a narrow
    projection fetches only the referenced columns."""
    db.sql("CREATE INDEX i ON t USING HNSW (vec)")
    q = "SELECT id FROM t ORDER BY array_distance(vec, [0.0,0.0,0.0,0.0]) LIMIT 3"
    plan = db.sql("EXPLAIN " + q)["explain"][0]
    assert "HNSW_INDEX_SCAN" in plan and "cols=[id]" in plan
    r = db.sql(q)
    assert len(r["id"]) == 3
    # projecting an expression over two columns pulls exactly those
    q2 = (
        "SELECT id, array_distance(vec, [0.0,0.0,0.0,0.0]) AS d FROM t "
        "ORDER BY array_distance(vec, [0.0,0.0,0.0,0.0]) LIMIT 3"
    )
    plan2 = db.sql("EXPLAIN " + q2)["explain"][0]
    assert "cols=[id, vec]" in plan2
    r2 = db.sql(q2)
    assert np.all(np.diff(r2["d"]) >= 0)
    assert r2["id"].tolist() == r["id"].tolist()


def test_projection_pushdown_brute_force(db):
    q = "SELECT name FROM t ORDER BY array_distance(vec, [0.0,0.0,0.0,0.0]) LIMIT 2"
    plan = db.sql("EXPLAIN " + q)["explain"][0]
    assert "BRUTE_FORCE_TOPK" in plan and "cols=[name]" in plan
    r = db.sql(q)
    assert len(r["name"]) == 2


def test_pushed_filter_mask_vectorized(db):
    """Filtered search: the slot mask is built vectorized; the scan
    returns k rows all satisfying the predicate."""
    db.sql("CREATE INDEX i ON t USING HNSW (vec)")
    db.set_setting("hnsw_pushdown_filters", True)
    q = (
        "SELECT id FROM t WHERE id >= 250 "
        "ORDER BY array_distance(vec, [0.0,0.0,0.0,0.0]) LIMIT 5"
    )
    plan = db.sql("EXPLAIN " + q)["explain"][0]
    assert "filtered" in plan
    r = db.sql(q)
    assert len(r["id"]) == 5
    assert all(i >= 250 for i in r["id"])


def test_pushed_filter_mask_is_cached_device_resident(db, monkeypatch):
    """Repeat filtered queries must NOT redo the host pass (predicate
    eval + isin over the slot tape): the device mask is cached per
    (predicate, table version, graph version) and only invalidated by
    DML. Mirrors index_dense.hpp:1816-1828 applying the predicate inside
    the search with zero per-query host work."""
    import vss_tpu.query.exec as ex

    db.sql("CREATE INDEX i ON t USING HNSW (vec)")
    db.set_setting("hnsw_pushdown_filters", True)
    q = (
        "SELECT id FROM t WHERE id >= 250 "
        "ORDER BY array_distance(vec, [0.0,0.0,0.0,0.0]) LIMIT 5"
    )
    calls = {"n": 0}
    real_isin = ex.np.isin

    def counting_isin(*a, **kw):
        calls["n"] += 1
        return real_isin(*a, **kw)

    monkeypatch.setattr(ex.np, "isin", counting_isin)
    r1 = db.sql(q)
    assert calls["n"] == 1
    r2 = db.sql(q)
    r3 = db.sql(q)
    assert calls["n"] == 1, "repeat filtered search redid the host pass"
    assert r1["id"].tolist() == r2["id"].tolist() == r3["id"].tolist()
    # a different predicate builds (and caches) its own mask
    q2 = q.replace("id >= 250", "id >= 100")
    db.sql(q2)
    db.sql(q2)
    assert calls["n"] == 2
    # DML invalidates: the next filtered search rebuilds the mask once
    db.sql("INSERT INTO t VALUES (999, 'x', [0.0,0.0,0.0,0.0], 0.0)")
    r4 = db.sql(q)
    assert calls["n"] == 3
    assert all(i >= 250 for i in r4["id"])


def test_macro_score_follows_reference_semantics(rng):
    """vss_join/vss_match score: euclidean ascending for l2sq (min_by),
    similarity descending for cosine/ip (max_by) — the reference macros'
    CASE (hnsw_index_macros.cpp:24-25,55-56)."""
    from vss_tpu import vss_join, vss_match

    db = Database()
    g = rng.standard_normal((50, 4)).astype(np.float32)
    q = rng.standard_normal((5, 4)).astype(np.float32)
    db.create_table("items", {"id": np.arange(50), "vec": g})
    db.create_table("queries", {"qid": np.arange(5), "qvec": q})

    r = vss_join(db, "queries", "items", "qvec", "vec", k=3, metric="l2sq")
    s = r["score"].reshape(5, 3)
    assert np.all(np.diff(s, axis=1) >= 0)  # ascending distance
    # score IS the euclidean distance
    d0 = np.linalg.norm(q[0] - g[int(r["right_id"][0])])
    assert abs(s[0, 0] - d0) < 1e-3

    r = vss_join(db, "queries", "items", "qvec", "vec", k=3, metric="cosine")
    s = r["score"].reshape(5, 3)
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # descending similarity
    cos = float(
        np.dot(q[0], g[int(r["right_id"][0])])
        / (np.linalg.norm(q[0]) * np.linalg.norm(g[int(r["right_id"][0])]))
    )
    assert abs(s[0, 0] - cos) < 1e-3

    r = vss_match(db, "items", q[0], "vec", k=3, metric="ip")
    assert np.all(np.diff(r["score"]) <= 1e-6)  # descending inner product
    assert abs(r["score"][0] - float(np.dot(q[0], g[int(r['id'][0])]))) < 1e-3
