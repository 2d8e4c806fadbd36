"""LATERAL top-k join SQL — the reference's `hnsw_lateral_join.test` and
`hnsw_lateral_join_group.test` queries run verbatim (modulo ::FLOAT[N]
casts), with indexed/unindexed parity (the reference's labeled-result
technique) and plan-shape assertions."""
import numpy as np
import pytest

from vss_tpu import Database


@pytest.fixture
def db():
    """The tables from hnsw_lateral_join.test:6-16."""
    d = Database()
    d.sql("CREATE TABLE a (a_vec FLOAT[3], a_id INT)")
    d.sql("CREATE TABLE b (b_vec FLOAT[3], b_str VARCHAR)")
    d.sql("INSERT INTO a VALUES ([1.0, 2.0, 3.0], 1), ([4.0, 5.0, 6.0], 2)")
    d.sql("INSERT INTO b VALUES ([4.0, 5.0, 6.0], 'b'), ([1.0, 2.0, 3.0], 'a')")
    return d


Q_BASIC = (
    "select * from a, lateral (select *, a_id as id_dup from b "
    "order by array_distance(a.a_vec, b.b_vec) limit 1)"
)
Q_PROJ = (
    "select * from a, lateral (select array_distance(a.a_vec, b.b_vec) as "
    "dist, *, a_id as id_dup from b order by dist limit 1)"
)
Q_LIMIT2 = (
    "select * from a, lateral (select *, a_id as id_dup from b "
    "order by array_distance(a.a_vec, b.b_vec) limit 2)"
)
Q_TWO_KEYS = (
    "select * from a, lateral (select *, a_id as id_dup from b "
    "order by array_distance(a.a_vec, b.b_vec), b_str DESC limit 2)"
)


def rows(r, cols):
    return sorted(zip(*(r[c].tolist() for c in cols)))


def test_lateral_basic(db):
    """hnsw_lateral_join.test:22-27 — rows + intra-subquery projection of
    an outer column."""
    db.sql("CREATE INDEX my_idx ON b USING HNSW (b_vec)")
    assert "HNSW_INDEX_JOIN" in db.sql("EXPLAIN " + Q_BASIC)["explain"][0]
    r = db.sql(Q_BASIC)
    assert rows(r, ("a_id", "b_str", "id_dup")) == [(1, "a", 1), (2, "b", 2)]
    # vector columns from both sides come through
    assert np.allclose(sorted(r["a_vec"].tolist()), sorted(r["b_vec"].tolist()))


def test_lateral_projected_distance(db):
    """hnsw_lateral_join.test:31-36 — distance aliased inside the subquery
    and referenced by ORDER BY."""
    db.sql("CREATE INDEX my_idx ON b USING HNSW (b_vec)")
    assert "HNSW_INDEX_JOIN" in db.sql("EXPLAIN " + Q_PROJ)["explain"][0]
    r = db.sql(Q_PROJ)
    assert np.allclose(np.sort(r["dist"]), [0.0, 0.0])
    assert rows(r, ("a_id", "b_str")) == [(1, "a"), (2, "b")]


def test_lateral_indexed_matches_unindexed(db):
    """The labeled-equivalence technique (hnsw_lateral_join.test:39-47):
    same query with and without the index must agree."""
    want = rows(db.sql(Q_LIMIT2), ("a_id", "b_str", "id_dup"))
    db.sql("CREATE INDEX my_idx ON b USING HNSW (b_vec)")
    assert "HNSW_INDEX_JOIN" in db.sql("EXPLAIN " + Q_LIMIT2)["explain"][0]
    assert rows(db.sql(Q_LIMIT2), ("a_id", "b_str", "id_dup")) == want


def test_lateral_null_inner(db):
    """hnsw_lateral_join.test:49-61 — NULL inner vectors sort last on the
    brute plan and are absent from the index; results agree while >= k
    non-NULL rows exist."""
    db.sql("INSERT INTO b VALUES (NULL, 'none')")
    want = rows(db.sql(Q_LIMIT2), ("a_id", "b_str"))
    assert want == [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    db.sql("CREATE INDEX my_idx ON b USING HNSW (b_vec)")
    assert rows(db.sql(Q_LIMIT2), ("a_id", "b_str")) == want


def test_lateral_secondary_order_key_falls_back(db):
    """hnsw_lateral_join.test:63-76 — a second ORDER BY key blocks the
    index rewrite (the reference requires exactly one ASC window order,
    hnsw_optimize_join.cpp:479); results must still be correct, including
    a NULL outer vector whose rows order purely by the tiebreak key."""
    db.sql("INSERT INTO b VALUES (NULL, 'none')")
    db.sql("INSERT INTO a VALUES (NULL, 3)")
    want = rows(db.sql(Q_TWO_KEYS), ("a_id", "b_str"))
    # NULL outer -> all-NULL distances -> b_str DESC picks 'none', 'b'
    assert want == [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b"), (3, "none"),
    ]
    db.sql("CREATE INDEX my_idx ON b USING HNSW (b_vec)")
    plan = db.sql("EXPLAIN " + Q_TWO_KEYS)["explain"][0]
    assert "LATERAL_TOPK_JOIN" in plan and "HNSW_INDEX_JOIN" not in plan
    assert rows(db.sql(Q_TWO_KEYS), ("a_id", "b_str")) == want


def test_lateral_group_by(db):
    """hnsw_lateral_join.test:78-87 — list() aggregate over the join,
    grouped by the outer id."""
    q = (
        "select a_id, list(b_str ORDER BY array_distance(a.a_vec, b.b_vec)"
        ", b_str) from a, lateral (select *, a_id as id_dup from b order "
        "by array_distance(a.a_vec, b.b_vec), b_str limit 2) GROUP BY a_id"
    )
    want = db.sql(q)
    assert dict(zip(want["a_id"].tolist(), want["list"].tolist())) == {
        1: ["a", "b"], 2: ["b", "a"],
    }


class TestLateralGroupLarge:
    """hnsw_lateral_join_group.test — 2 queries x 2k items, alias group
    keys, ordered list(), indexed/unindexed parity."""

    Q_SCAN = """
        SELECT queries.id as id, nbr
        FROM queries, LATERAL (
            SELECT items.id as nbr,
                   array_distance(items.embedding, queries.embedding) as dist
            FROM items ORDER BY dist LIMIT 3
        )"""
    Q_GROUP = """
        SELECT queries.id as id, list(nbr ORDER BY dist, nbr)
        FROM queries, LATERAL (
            SELECT items.id as nbr,
                   array_distance(queries.embedding, items.embedding) as dist
            FROM items ORDER BY dist LIMIT 3
        ) GROUP BY id"""

    @pytest.fixture
    def db2(self, rng):
        d = Database()
        d.sql("CREATE TABLE queries (id INT, embedding FLOAT[3])")
        d.sql("INSERT INTO queries VALUES (1, [5, 5, 5]), (2, [42, 42, 42])")
        d.sql("CREATE TABLE items (id INT, embedding FLOAT[3])")
        d.insert(
            "items",
            {
                "id": np.arange(1, 2001),
                "embedding": rng.random((2000, 3)).astype(np.float32),
            },
        )
        return d

    def test_parity(self, db2):
        scan = rows(db2.sql(self.Q_SCAN), ("id", "nbr"))
        grp = db2.sql(self.Q_GROUP)
        grp_want = dict(zip(grp["id"].tolist(), grp["list"].tolist()))
        db2.sql("CREATE INDEX items_embedding_idx ON items USING HNSW (embedding)")
        plan = db2.sql("EXPLAIN " + self.Q_SCAN)["explain"][0]
        assert "HNSW_INDEX_JOIN" in plan
        assert rows(db2.sql(self.Q_SCAN), ("id", "nbr")) == scan
        grp2 = db2.sql(self.Q_GROUP)
        assert dict(zip(grp2["id"].tolist(), grp2["list"].tolist())) == grp_want


def test_min_by_filter_preserved():
    """min_by(...) FILTER (WHERE p) survives the index rewrite and applies
    over the scanned rows (hnsw_optimize_topk.cpp:193)."""
    d = Database()
    d.sql("CREATE TABLE t (id BIGINT, vec FLOAT[2])")
    vecs = np.stack([np.arange(20), np.zeros(20)], axis=1).astype(np.float32)
    d.insert("t", {"id": np.arange(20), "vec": vecs})
    q = (
        "SELECT min_by(id, array_distance(vec, [0.0, 0.0]), 5) "
        "FILTER (WHERE id > 1) FROM t"
    )
    r = d.sql(q)
    assert list(r["min_by"][0]) == [2, 3, 4, 5, 6]
    d.sql("CREATE INDEX i ON t USING HNSW (vec)")
    plan = d.sql("EXPLAIN " + q)["explain"][0]
    assert "HNSW_INDEX_SCAN" in plan and "FILTER" in plan
    # index path: filter applies within the k scanned rows (reference
    # semantics) -> subset of the brute answer
    r2 = d.sql(q)
    assert list(r2["min_by"][0]) == [2, 3, 4]


def test_max_by_sql():
    """max_by(value, order, k): descending order, no index rewrite."""
    d = Database()
    d.sql("CREATE TABLE t (id BIGINT, score FLOAT)")
    d.insert("t", {"id": np.arange(6), "score": np.asarray([3., 1., 5., 2., 4., 0.])})
    r = d.sql("SELECT max_by(id, score, 3) FROM t")
    assert list(r["max_by"][0]) == [2, 4, 0]


def test_order_by_multiple_keys_top_level():
    d = Database()
    d.sql("CREATE TABLE t (g BIGINT, v FLOAT)")
    d.insert("t", {"g": np.asarray([1, 0, 1, 0]), "v": np.asarray([2., 3., 1., 4.])})
    r = d.sql("SELECT g, v FROM t ORDER BY g, v DESC")
    assert r["g"].tolist() == [0, 0, 1, 1]
    assert r["v"].tolist() == [4.0, 3.0, 2.0, 1.0]
