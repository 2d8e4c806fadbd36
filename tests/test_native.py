"""Native C++ components: host builder quality + block store semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig, hnsw_search
from vss_tpu.ops import bruteforce_topk

native = pytest.importorskip("vss_tpu.index.native")
if not native.native_available():
    pytest.skip("no C++ toolchain", allow_module_level=True)


def recall(ids, true_ids):
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(ids, true_ids)
    )
    return hits / true_ids[true_ids >= 0].size


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
def test_native_build_recall(rng, metric):
    n, d, k = 8000, 64, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric=metric)
    graph, upper_used = native.build_graph_native(vecs, cfg)
    assert int(graph.count) == n
    assert upper_used > 0
    q = jnp.asarray(rng.standard_normal((100, d)).astype(np.float32))
    sd, si = hnsw_search(graph, cfg, q, k=k, ef=96)
    bd, bi = bruteforce_topk(q, jnp.asarray(vecs), k, metric)
    r = recall(np.asarray(si), np.asarray(bi))
    assert r >= 0.9, f"{metric} native recall {r}"


def test_native_build_empty():
    cfg = HNSWConfig(dims=4)
    graph, used = native.build_graph_native(np.zeros((0, 4), np.float32), cfg)
    assert int(graph.entry) == -1
    assert used == 0


def test_native_matches_expected_shapes(rng):
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    cfg = HNSWConfig(dims=8, m=4)
    graph, _ = native.build_graph_native(vecs, cfg)
    assert graph.adj0.shape[1] == 8  # m0 = 2m
    d, i = hnsw_search(graph, cfg, jnp.asarray(vecs[:5]), k=1)
    assert np.asarray(i)[:, 0].tolist() == [0, 1, 2, 3, 4]


class TestBlockStore:
    @pytest.fixture(autouse=True)
    def _check(self):
        from vss_tpu.storage.blockfile import blockstore_available

        if not blockstore_available():
            pytest.skip("no C++ toolchain")

    def test_put_get_roundtrip(self, tmp_path):
        from vss_tpu.storage.blockfile import BlockStore

        p = str(tmp_path / "store.vssdb")
        with BlockStore(p, block_size=4096) as bs:
            bs.put("a", b"hello world")
            bs.put("big", bytes(range(256)) * 100)  # multi-block
            assert bs.get("a") == b"hello world"
            assert bs.get("big") == bytes(range(256)) * 100
        # reopen
        with BlockStore(p) as bs:
            assert sorted(bs.list()) == ["a", "big"]
            assert bs.get("a") == b"hello world"
            assert bs.get("big") == bytes(range(256)) * 100

    def test_overwrite_and_delete(self, tmp_path):
        from vss_tpu.storage.blockfile import BlockStore

        p = str(tmp_path / "store.vssdb")
        with BlockStore(p, block_size=4096) as bs:
            bs.put("x", b"v1")
            bs.put("x", b"v2" * 5000)
            assert bs.get("x") == b"v2" * 5000
            bs.delete("x")
            assert "x" not in bs
            with pytest.raises(KeyError):
                bs.get("x")

    def test_block_reclaim(self, tmp_path):
        """The reference's hnsw_reclaim_storage behavior: drop/recreate
        loops must reuse blocks, not grow the file."""
        from vss_tpu.storage.blockfile import BlockStore

        p = str(tmp_path / "store.vssdb")
        payload = bytes(1000) * 500  # ~500KB -> many blocks
        with BlockStore(p, block_size=4096) as bs:
            bs.put("idx", payload)
            grown = bs.total_blocks
            for _ in range(5):
                bs.delete("idx")
                bs.put("idx", payload)
            # allow a little slack for directory chain movement
            assert bs.total_blocks <= grown + 4, (bs.total_blocks, grown)

    def test_missing_stream(self, tmp_path):
        from vss_tpu.storage.blockfile import BlockStore

        with BlockStore(str(tmp_path / "s.vssdb")) as bs:
            with pytest.raises(KeyError):
                bs.get("nope")

    def test_empty_value(self, tmp_path):
        from vss_tpu.storage.blockfile import BlockStore

        p = str(tmp_path / "s.vssdb")
        with BlockStore(p) as bs:
            bs.put("empty", b"")
            assert bs.get("empty") == b""
        with BlockStore(p) as bs:
            assert bs.get("empty") == b""


def test_database_vssdb_single_file(tmp_path, rng):
    """End-to-end single-file checkpoint through the block store."""
    from vss_tpu import Database
    from vss_tpu.storage.blockfile import blockstore_available

    if not blockstore_available():
        pytest.skip("no C++ toolchain")
    db = Database()
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    db.create_table("t", {"id": np.arange(300), "vec": vecs})
    db.set_setting("hnsw_enable_experimental_persistence", True)
    db.create_hnsw_index("i", "t", "vec")
    p = str(tmp_path / "db.vssdb")
    db.checkpoint(p)
    db2 = Database.open(p)
    assert db2.table("t").num_rows == 300
    from vss_tpu.query import col, const, fn

    q = (
        db2.query("t")
        .order_by(fn("array_distance", col("vec"), const(vecs[5])))
        .limit(1)
        .select("id")
    )
    assert "HNSW_INDEX_SCAN" in q.explain()
    assert q.execute()["id"][0] == 5
    # re-checkpoint into the same file (dirty tracking + block reuse)
    db2.insert("t", {"id": [999], "vec": vecs[:1] + 5.0})
    db2.checkpoint(p)
    db3 = Database.open(p)
    assert db3.table("t").num_rows == 301


def test_db_index_drop_recreate_reclaims_blocks(tmp_path, rng):
    """hnsw_reclaim_storage.test_slow analog at the database level: drop +
    recreate + checkpoint loops must not grow the single-file store."""
    from vss_tpu import Database
    from vss_tpu.storage.blockfile import BlockStore, blockstore_available

    if not blockstore_available():
        pytest.skip("no C++ toolchain")
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    db = Database()
    db.create_table("t", {"id": np.arange(500), "vec": vecs})
    db.set_setting("hnsw_enable_experimental_persistence", True)
    db.create_hnsw_index("i", "t", "vec")
    p = str(tmp_path / "reclaim.vssdb")
    db.checkpoint(p)
    import os

    baseline = os.path.getsize(p)
    for _ in range(4):
        db.drop_index("i")
        db.create_hnsw_index("i", "t", "vec")
        db.checkpoint(p)
    grown = os.path.getsize(p)
    assert grown <= baseline * 1.3, (baseline, grown)
    with BlockStore(p) as bs:
        assert bs.free_blocks >= 0  # store remains consistent
    db2 = Database.open(p)
    d, rows = db2.indexes["i"].index.search(vecs[:3], k=1)
    assert np.asarray(rows)[:, 0].tolist() == [0, 1, 2]


def test_blockstore_rejects_long_names(tmp_path):
    """Directory records have a fixed 56-byte name field; longer names
    previously truncated silently and could collide after reopen."""
    from vss_tpu.storage.blockfile import BlockStore, blockstore_available

    if not blockstore_available():
        import pytest

        pytest.skip("native blockstore unavailable")
    with BlockStore(str(tmp_path / "s.vssdb")) as bs:
        bs.put("x" * 55, b"ok")
        import pytest

        with pytest.raises(IOError):
            bs.put("y" * 56, b"no")
        assert bs.get("x" * 55) == b"ok"
