"""Checkpoint round-trips (the reference's hnsw_insert/experimental
persistence test analogs)."""
import io

import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex
from vss_tpu.storage import (
    deserialize_index,
    load_index,
    save_index,
    serialize_index,
)


@pytest.fixture
def built(rng):
    vecs = rng.standard_normal((400, 12)).astype(np.float32)
    cfg = HNSWConfig(dims=12, metric="cosine", m=8, ef_construction=64)
    idx = HNSWIndex.build(vecs, cfg, wave_size=128)
    return idx, vecs


def test_roundtrip_search_identical(built, rng, tmp_path):
    idx, vecs = built
    p = str(tmp_path / "index.vss")
    save_index(idx, p)
    assert not idx.dirty
    idx2 = load_index(p)
    assert idx2.count == idx.count
    assert idx2.config == idx.config
    q = jnp.asarray(rng.standard_normal((20, 12)).astype(np.float32))
    d1, r1 = idx.search(q, k=5)
    d2, r2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_roundtrip_preserves_tombstones(built, tmp_path):
    idx, vecs = built
    idx.delete([0, 1, 2])
    p = str(tmp_path / "index.vss")
    save_index(idx, p)
    idx2 = load_index(p)
    assert idx2.deleted_count == 3
    assert sorted(idx2.free_slots) == sorted(idx.free_slots)
    d, rows = idx2.search(jnp.asarray(vecs[0][None]), k=3)
    assert 0 not in np.asarray(rows)
    # recycled insert still works after reload
    idx2.insert(vecs[0][None], [9000])
    d, rows = idx2.search(jnp.asarray(vecs[0][None]), k=1)
    assert int(np.asarray(rows)[0, 0]) == 9000


def test_roundtrip_then_modify(built, rng, tmp_path):
    idx, vecs = built
    p = str(tmp_path / "index.vss")
    save_index(idx, p)
    idx2 = load_index(p)
    nv = rng.standard_normal((10, 12)).astype(np.float32)
    idx2.insert(nv, np.arange(1000, 1010))
    assert idx2.count == 410
    d, rows = idx2.search(jnp.asarray(nv[:3]), k=1)
    assert np.asarray(rows)[:, 0].tolist() == [1000, 1001, 1002]
    assert idx2.dirty


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="bad checkpoint magic"):
        deserialize_index(io.BytesIO(b"NOTVSS00" + b"\x00" * 64))


def test_truncated_rejected(built):
    idx, _ = built
    buf = io.BytesIO()
    serialize_index(idx, buf)
    data = buf.getvalue()
    with pytest.raises(ValueError, match="truncated"):
        deserialize_index(io.BytesIO(data[: len(data) // 2]))


def test_empty_index_roundtrip(tmp_path):
    cfg = HNSWConfig(dims=4)
    idx = HNSWIndex(cfg)
    p = str(tmp_path / "empty.vss")
    save_index(idx, p)
    idx2 = load_index(p)
    assert idx2.count == 0
    d, rows = idx2.search(jnp.zeros((1, 4)), k=3)
    assert np.all(np.asarray(rows) == -1)


class TestWalAndView:
    """WAL replay + mmap view() load (the reference's WAL path and
    usearch view(), hnsw_index.cpp:574-585 / index.hpp:3276-3310 — except
    this WAL actually replays, unlike upstream's)."""

    def test_wal_replay_after_crash(self, tmp_path, rng):
        from vss_tpu import Database

        db = Database()
        db.sql("CREATE TABLE t (id BIGINT, vec FLOAT[4])")
        db.insert(
            "t",
            {"id": np.arange(100),
             "vec": rng.standard_normal((100, 4)).astype(np.float32)},
        )
        db.sql("SET hnsw_enable_experimental_persistence = TRUE")
        db.create_hnsw_index("idx", "t", "vec")
        path = str(tmp_path / "d")
        db.checkpoint(path)
        db.enable_wal()
        # post-checkpoint DML: logged, NOT re-checkpointed
        db.insert("t", {"id": [500], "vec": [[9.0, 9.0, 9.0, 9.0]]})
        db.delete("t", [0, 1])
        db.update("t", [2], {"vec": [[7.0, 7.0, 7.0, 7.0]]})
        want = db.sql("SELECT count(*) FROM t")["count"][0]
        # "crash": reopen from the stale checkpoint; WAL replays
        db2 = Database.open(path)
        assert db2.sql("SELECT count(*) FROM t")["count"][0] == want
        r = db2.sql(
            "SELECT id FROM t ORDER BY array_distance(vec, [9.,9.,9.,9.]) LIMIT 1"
        )
        assert r["id"][0] == 500  # index was maintained during replay
        r = db2.sql(
            "SELECT id FROM t ORDER BY array_distance(vec, [7.,7.,7.,7.]) LIMIT 1"
        )
        assert r["id"][0] == 2  # the updated row's new vector is indexed
        # checkpoint truncates the log; reopening applies nothing twice
        db2.checkpoint(path)
        db3 = Database.open(path)
        assert db3.sql("SELECT count(*) FROM t")["count"][0] == want

    def test_wal_torn_tail_ignored(self, tmp_path, rng):
        from vss_tpu import Database

        db = Database()
        db.sql("CREATE TABLE t (id BIGINT, s VARCHAR)")
        db.insert("t", {"id": [1], "s": ["a"]})
        path = str(tmp_path / "d")
        db.checkpoint(path)
        wal = db.enable_wal()
        db.insert("t", {"id": [2], "s": [None]})
        with open(wal, "a") as f:
            f.write('{"op": "insert", "table": "t", "da')  # torn record
        db2 = Database.open(path)
        assert db2.sql("SELECT count(*) FROM t")["count"][0] == 2
        assert db2.sql("SELECT s FROM t")["s"].tolist() == ["a", None]

    def test_view_index_mmap(self, built, tmp_path, rng):
        from vss_tpu.storage import load_index

        idx, vecs = built
        p = str(tmp_path / "index.vss")
        from vss_tpu.storage import save_index

        save_index(idx, p)
        v = load_index(p, view=True)
        assert isinstance(np.asarray(v.graph.vectors), np.ndarray)
        q = vecs[:10] + 0.01
        d1, r1 = idx.search(q, k=5)
        d2, r2 = v.search(q, k=5)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        # a view can still accept DML (copy-on-grow)
        v.insert(rng.standard_normal((3, 12)).astype(np.float32), [900, 901, 902])
        d3, r3 = v.search(v.graph.vectors[v.rowid_to_slot[900]][None], k=1)
        assert int(np.asarray(r3)[0, 0]) == 900
