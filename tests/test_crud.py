"""CRUD semantics: insert, tombstone delete, slot recycling, compaction.
Mirrors the reference's hnsw_crud.test / hnsw_insert.test coverage."""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex
from vss_tpu.ops import bruteforce_topk


def recall(ids, true_ids):
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(ids, true_ids)
    )
    return hits / true_ids[true_ids >= 0].size


@pytest.fixture
def small_index(rng):
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    cfg = HNSWConfig(dims=16)
    idx = HNSWIndex.build(vecs, cfg, wave_size=128)
    return idx, vecs


def test_incremental_insert_matches_bulk(rng):
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    cfg = HNSWConfig(dims=16)
    idx = HNSWIndex(cfg)
    for s in range(0, 300, 50):
        idx.insert(vecs[s : s + 50], np.arange(s, s + 50))
    assert idx.count == 300
    q = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
    d, rows = idx.search(q, k=5)
    bd, bi = bruteforce_topk(q, jnp.asarray(vecs), 5, "l2sq")
    assert recall(np.asarray(rows), np.asarray(bi)) >= 0.9


def test_delete_excludes_rows(small_index, rng):
    idx, vecs = small_index
    q = jnp.asarray(vecs[7][None, :])
    d, rows = idx.search(q, k=1)
    assert int(np.asarray(rows)[0, 0]) == 7
    assert idx.delete([7]) == 1
    assert idx.count == 499
    d, rows = idx.search(q, k=5)
    assert 7 not in np.asarray(rows)


def test_delete_missing_rowid(small_index):
    idx, _ = small_index
    assert idx.delete([999999]) == 0


def test_insert_recycles_tombstoned_slots(small_index, rng):
    idx, vecs = small_index
    before_next = idx.next_slot
    idx.delete([1, 2, 3])
    assert idx.deleted_count == 3
    nv = rng.standard_normal((3, 16)).astype(np.float32)
    idx.insert(nv, [1001, 1002, 1003])
    assert idx.next_slot == before_next  # no new slots claimed
    assert idx.deleted_count == 0
    d, rows = idx.search(jnp.asarray(nv), k=1)
    assert sorted(np.asarray(rows)[:, 0].tolist()) == [1001, 1002, 1003]


def test_duplicate_rowid_rejected(small_index, rng):
    idx, _ = small_index
    with pytest.raises(ValueError, match="duplicate rowid"):
        idx.insert(rng.standard_normal((1, 16)).astype(np.float32), [7])


def test_compact_removes_tombstones(small_index, rng):
    idx, vecs = small_index
    dead = list(range(0, 100))
    idx.delete(dead)
    idx.compact()
    assert idx.deleted_count == 0
    assert idx.next_slot == 400
    assert idx.count == 400
    # correctness post-compact
    q = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
    d, rows = idx.search(q, k=5)
    live = jnp.asarray(vecs[100:])
    bd, bi = bruteforce_topk(q, live, 5, "l2sq")
    true_rows = np.asarray(bi) + 100
    true_rows[np.asarray(bi) < 0] = -1
    assert recall(np.asarray(rows), true_rows) >= 0.85
    # deleted rows never reappear
    assert not set(np.asarray(rows).ravel().tolist()) & set(dead)


def test_compact_noop_when_clean(small_index):
    idx, _ = small_index
    before = np.asarray(idx.graph.adj0).copy()
    idx.compact()
    np.testing.assert_array_equal(np.asarray(idx.graph.adj0), before)


def test_capacity_growth(rng):
    cfg = HNSWConfig(dims=8)
    idx = HNSWIndex(cfg, capacity=64)
    vecs = rng.standard_normal((500, 8)).astype(np.float32)
    idx.insert(vecs, np.arange(500))
    assert idx.capacity >= 500 + 8
    d, rows = idx.search(jnp.asarray(vecs[:5]), k=1)
    assert np.asarray(rows)[:, 0].tolist() == [0, 1, 2, 3, 4]


def test_stats(small_index):
    idx, _ = small_index
    st = idx.stats()
    assert st["count"] == 500
    assert st["dimensions"] == 16
    assert st["connectivity"] == 16
    assert st["connectivity_base"] == 32
    assert st["num_levels"] >= 1
    assert st["levels"][0]["nodes"] == 500
    assert 0 < st["levels"][0]["edges"] <= st["levels"][0]["max_edges"]


def test_optimize_layout_preserves_results(small_index, rng):
    idx, vecs = small_index
    q = jnp.asarray(rng.standard_normal((30, 16)).astype(np.float32))
    d1, r1 = idx.search(q, k=5, ef=96)
    idx.optimize_layout(n_clusters=16)
    d2, r2 = idx.search(q, k=5, ef=96)
    # same database, permuted layout: results must be equivalent sets with
    # identical distances (graph traversal order may differ on ties)
    np.testing.assert_allclose(
        np.sort(np.asarray(d1), axis=1), np.sort(np.asarray(d2), axis=1), atol=1e-5
    )
    overlap = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(r1), np.asarray(r2))
    ) / np.asarray(r1).size
    assert overlap >= 0.95
    # CRUD still works after relayout
    idx.delete([int(np.asarray(r2)[0, 0])])
    idx.insert(rng.standard_normal((1, 16)).astype(np.float32), [77777])
    d3, r3 = idx.search(q, k=5, ef=96)
    assert np.asarray(r3).shape == (30, 5)


def test_vacuum_and_merge_parity(small_index):
    idx, _ = small_index
    idx.vacuum()  # no-op, like the reference
    with pytest.raises(NotImplementedError, match="MergeIndexes"):
        idx.merge(idx)


def test_concurrent_search_and_insert(rng):
    """Concurrent readers with a writer (coarse-lock sanity)."""
    import threading

    from vss_tpu import Database

    db = Database()
    vecs = rng.standard_normal((400, 8)).astype(np.float32)
    db.create_table("t", {"id": np.arange(400), "vec": vecs})
    db.create_hnsw_index("i", "t", "vec")
    errors = []

    def reader():
        try:
            for _ in range(20):
                r = db.sql(
                    "SELECT id FROM t ORDER BY array_distance(vec, "
                    + "[" + ",".join(f"{x:.3f}" for x in vecs[3]) + "]) LIMIT 3"
                )
                assert len(r["id"]) == 3
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def writer():
        try:
            for j in range(10):
                db.insert("t", {"id": [1000 + j],
                                "vec": rng.standard_normal((1, 8)).astype(np.float32)})
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(3)] + [
        threading.Thread(target=writer)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert db.table("t").num_rows == 410


class TestAdvisoryFixes:
    """Regression tests for the round-1 advisor findings (ADVICE.md)."""

    def test_failed_insert_leaves_table_untouched(self):
        """A rejected INSERT (NULL into integer column) must not leave
        earlier columns extended (atomic append)."""
        from vss_tpu.query.table import Database, BinderError
        import pytest

        db = Database()
        db.create_table(
            "t",
            {
                "name": np.asarray(["a", "b"], object),
                "score": np.asarray([1.0, 2.0], np.float64),
                "n": np.asarray([1, 2], np.int64),
            },
        )
        with pytest.raises(BinderError):
            db.insert("t", {"name": ["c"], "score": [2.0], "n": [None]})
        t = db.table("t")
        assert all(len(v) == 2 for v in t.columns.values())
        # a subsequent valid insert lands cleanly, no spliced ghost row
        db.insert("t", {"name": ["d"], "score": [3.0], "n": [3]})
        chunk = t.chunk()
        assert chunk["name"].tolist() == ["a", "b", "d"]
        assert chunk["n"].tolist() == [1, 2, 3]

    def test_rowid_int32_overflow_rejected(self, rng):
        from vss_tpu.index import HNSWConfig
        from vss_tpu.index.dense import HNSWIndex
        import pytest

        vecs = rng.standard_normal((4, 8)).astype(np.float32)
        cfg = HNSWConfig(dims=8)
        with pytest.raises(ValueError, match="int32"):
            HNSWIndex.build(vecs, cfg, rowids=np.asarray([0, 1, 2, 2**31]))
        idx = HNSWIndex.build(vecs, cfg)
        with pytest.raises(ValueError, match="int32"):
            idx.insert(vecs[:1], [2**40])

    def test_positions_of_rowids_survives_reorder(self):
        """positions_of_rowids must not assume physically sorted rowids."""
        from vss_tpu.query.table import Table

        t = Table("t", {"x": np.arange(6, dtype=np.int64)})
        # simulate a physical reorder (e.g. a future compaction)
        perm = np.asarray([3, 1, 5, 0, 4, 2])
        t.rowids = t.rowids[perm]
        t.row_valid = t.row_valid[perm]
        for c in t.columns:
            t.columns[c] = t.columns[c][perm]
        t._bump()
        pos = t.positions_of_rowids(np.asarray([5, 0, 99]))
        assert pos.tolist() == [2, 3, -1]
        assert t.columns["x"][pos[0]] == 5
