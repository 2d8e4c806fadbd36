"""rename / clone / join_indexes / SQL table functions."""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu import Database
from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex
from vss_tpu.index.join import join_indexes


@pytest.fixture
def idx(rng):
    vecs = rng.standard_normal((300, 12)).astype(np.float32)
    return HNSWIndex.build(vecs, HNSWConfig(dims=12), wave_size=128), vecs


def test_rename(idx):
    index, vecs = idx
    assert index.rename(5, 9005)
    d, rows = index.search(vecs[5][None], k=1)
    assert int(np.asarray(rows)[0, 0]) == 9005
    assert not index.rename(5, 10)          # old id gone
    with pytest.raises(ValueError, match="already exists"):
        index.rename(9005, 7)


def test_clone_independent(idx):
    index, vecs = idx
    c = index.clone()
    c.delete([3])
    assert c.count == 299 and index.count == 300
    d, rows = index.search(vecs[3][None], k=1)
    assert int(np.asarray(rows)[0, 0]) == 3


def test_join_indexes(rng):
    # b = permuted copy of a's vectors -> perfect matching expected
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    perm = rng.permutation(200)
    a = HNSWIndex.build(vecs, HNSWConfig(dims=16), wave_size=64)
    b = HNSWIndex.build(
        vecs[perm], HNSWConfig(dims=16), rowids=np.arange(1000, 1200),
        wave_size=64,
    )
    m = join_indexes(a, b, proposals=8)
    # matched pairs should overwhelmingly be the true correspondence
    good = sum(1 for ar, br in m.items() if perm[br - 1000] == ar)
    assert len(m) >= 190
    assert good / len(m) >= 0.95


def test_sql_table_functions(rng):
    db = Database()
    g = rng.standard_normal((100, 4)).astype(np.float32)
    q = g[:10] + 0.01
    db.create_table("items", {"id": np.arange(100), "vec": g})
    db.create_table("queries", {"qid": np.arange(10), "qvec": q})
    r = db.sql("SELECT * FROM vss_join(queries, items, qvec, vec, 2)")
    assert len(r["left_qid"]) == 20
    r = db.sql("SELECT * FROM vss_join(queries, items, qvec, vec, 2, 'cosine')")
    assert len(r["score"]) == 20
    vec_lit = "[" + ",".join(f"{x:.4f}" for x in g[7]) + "]"
    r = db.sql(f"SELECT * FROM vss_match(items, {vec_lit}, vec, 3)")
    assert r["id"][0] == 7
    r = db.sql("SELECT * FROM knn_join(queries, items, qvec, vec, 2)")
    assert len(r["l_qid"]) == 20
    assert r["r_id"][0] == 0  # nearest to q[0] = g[0]+eps is item 0
    # index-accelerated once an index exists
    db.create_hnsw_index("i", "items", "vec")
    r2 = db.sql("SELECT * FROM knn_join(queries, items, qvec, vec, 2)")
    assert r2["r_id"][0] == 0
    with pytest.raises(Exception, match="vss_join"):
        db.sql("SELECT * FROM vss_join(queries, items)")
