"""Reader concurrency + lazy index loading.

The reference searches under a shared lock while writers upgrade
(`/root/reference/src/hnsw/hnsw_index.cpp:331-333, 440-461`); here queries
take no lock at all — they read immutable array snapshots — and DML
publishes new arrays atomically. Restart defers index deserialization to
the first bind (`hnsw_index.cpp:221-239`)."""
import threading

import numpy as np
import pytest

from vss_tpu import Database


def test_search_during_insert_stress(rng):
    """Concurrent searches while a writer inserts: no exceptions, every
    result is a valid row, and queries never serialize on the DML lock."""
    db = Database()
    db.sql("CREATE TABLE items (id BIGINT, vec FLOAT[8])")
    base = rng.standard_normal((500, 8)).astype(np.float32)
    db.insert("items", {"id": np.arange(500), "vec": base})
    db.create_hnsw_index("idx", "items", "vec", wave_size=128)

    stop = threading.Event()
    errors: list = []

    def writer():
        try:
            i = 0
            while not stop.is_set() and i < 40:
                vec = rng.standard_normal((4, 8)).astype(np.float32)
                db.insert(
                    "items",
                    {"id": np.arange(1000 + 4 * i, 1004 + 4 * i), "vec": vec},
                )
                i += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            q = rng.standard_normal((4, 8)).astype(np.float32)
            for _ in range(25):
                r = db.sql(
                    "SELECT id FROM items ORDER BY "
                    f"array_distance(vec, {list(map(float, q[0]))}) LIMIT 5"
                )
                assert len(r["id"]) == 5
                assert all(i >= 0 for i in r["id"])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    stop.set()
    assert not errors, errors
    # final state consistent
    r = db.sql("SELECT count(*) FROM items")
    assert r["count"][0] == 500 + 40 * 4


def test_lazy_index_load(tmp_path, rng):
    """Database.open must not deserialize indexes until first use; queries
    trigger the load transparently; checkpointing a clean unloaded index
    re-uses the existing stream."""
    db = Database()
    db.sql("CREATE TABLE t (id BIGINT, vec FLOAT[4])")
    db.insert(
        "t",
        {"id": np.arange(200), "vec": rng.standard_normal((200, 4)).astype(np.float32)},
    )
    db.sql("SET hnsw_enable_experimental_persistence = TRUE")
    db.create_hnsw_index("idx", "t", "vec")
    want = db.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.1, 0.2, 0.3, 0.4]) LIMIT 3"
    )["id"].tolist()

    for path in (str(tmp_path / "d1"), str(tmp_path / "d2.vssdb")):
        try:
            db.checkpoint(path)
        except IOError:
            pytest.skip("blockstore unavailable")
        db2 = Database.open(path)
        entry = db2.indexes["idx"]
        assert not entry.loaded, "open() must defer index deserialization"
        got = db2.sql(
            "SELECT id FROM t ORDER BY array_distance(vec, [0.1, 0.2, 0.3, 0.4]) LIMIT 3"
        )["id"].tolist()
        assert entry.loaded
        assert got == want
        # re-checkpoint with the index still unloaded elsewhere: a fresh
        # open + checkpoint of the same path must not need the index
        db3 = Database.open(path)
        db3.checkpoint(path)
        assert not db3.indexes["idx"].loaded
        db4 = Database.open(path)
        got = db4.sql(
            "SELECT id FROM t ORDER BY array_distance(vec, [0.1, 0.2, 0.3, 0.4]) LIMIT 3"
        )["id"].tolist()
        assert got == want


def test_lazy_index_dml_triggers_load(tmp_path, rng):
    db = Database()
    db.sql("CREATE TABLE t (id BIGINT, vec FLOAT[4])")
    db.insert(
        "t",
        {"id": np.arange(50), "vec": rng.standard_normal((50, 4)).astype(np.float32)},
    )
    db.sql("SET hnsw_enable_experimental_persistence = TRUE")
    db.create_hnsw_index("idx", "t", "vec")
    path = str(tmp_path / "d")
    db.checkpoint(path)
    db2 = Database.open(path)
    assert not db2.indexes["idx"].loaded
    db2.insert("t", {"id": [999], "vec": [[9.0, 9.0, 9.0, 9.0]]})
    assert db2.indexes["idx"].loaded  # DML maintains the index
    r = db2.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [9.0, 9.0, 9.0, 9.0]) LIMIT 1"
    )
    assert r["id"][0] == 999
