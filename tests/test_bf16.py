"""bf16 vector-tape storage: recall parity with f32, persistence."""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu import Database
from vss_tpu.index import HNSWConfig, hnsw_search
from vss_tpu.index.build import build_graph_batched
from vss_tpu.ops import bruteforce_topk


def recall(ids, true_ids):
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(ids, true_ids)
    )
    return hits / true_ids[true_ids >= 0].size


def test_bf16_build_and_search(rng):
    n, d, k = 3000, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((50, d)).astype(np.float32))
    _, bi = bruteforce_topk(q, jnp.asarray(vecs), k, "l2sq")
    cfg = HNSWConfig(dims=d, storage_dtype="bf16")
    g, _ = build_graph_batched(vecs, cfg, wave_size=512)
    assert g.vectors.dtype == jnp.bfloat16
    _, si = hnsw_search(g, cfg, q, k=k, ef=96)
    r = recall(np.asarray(si), np.asarray(bi))
    assert r >= 0.85, f"bf16 recall {r}"


def test_bf16_sql_and_persistence(rng, tmp_path):
    db = Database()
    vecs = rng.standard_normal((400, 8)).astype(np.float32)
    db.create_table("t", {"id": np.arange(400), "vec": vecs})
    db.sql("CREATE INDEX bi ON t USING HNSW (vec) WITH (storage = 'bf16')")
    assert db.indexes["bi"].index.config.storage_dtype == "bf16"
    r = db.sql("SELECT id FROM t ORDER BY array_distance(vec, " +
               "[" + ",".join(f"{x:.4f}" for x in vecs[7]) + "]) LIMIT 1")
    assert r["id"][0] == 7
    db.set_setting("hnsw_enable_experimental_persistence", True)
    db.checkpoint(str(tmp_path / "db"))
    db2 = Database.open(str(tmp_path / "db"))
    assert db2.indexes["bi"].index.graph.vectors.dtype == jnp.bfloat16
    r = db2.sql("SELECT id FROM t ORDER BY array_distance(vec, " +
                "[" + ",".join(f"{x:.4f}" for x in vecs[7]) + "]) LIMIT 1")
    assert r["id"][0] == 7


def test_bad_storage_option():
    from vss_tpu import BinderError

    db = Database()
    db.create_table("t", {"vec": np.ones((10, 4), np.float32)})
    with pytest.raises(BinderError, match="storage"):
        db.create_hnsw_index("i", "t", "vec", storage="f64")


def test_int8_build_and_search(rng):
    from vss_tpu.index.dense import HNSWIndex

    n, d, k = 3000, 32, 10
    # byte-ranged data (the int8 sweet spot, like SIFT descriptors)
    vecs = rng.uniform(0, 255, (n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, storage_dtype="int8")
    idx = HNSWIndex.build(vecs, cfg, wave_size=512, method="wave")
    assert idx.graph.vectors.dtype == jnp.int8
    assert idx.vector_scale > 0
    q = rng.uniform(0, 255, (50, d)).astype(np.float32)
    sd, si = idx.search(q, k=k, ef=96)
    _, bi = bruteforce_topk(jnp.asarray(q), jnp.asarray(vecs), k, "l2sq")
    r = recall(np.asarray(si), np.asarray(bi))
    assert r >= 0.85, f"int8 recall {r}"
    # rescaled distances approximate true l2sq
    true_d = ((q[0] - vecs[np.asarray(si)[0, 0]]) ** 2).sum()
    assert abs(float(np.asarray(sd)[0, 0]) - true_d) / max(true_d, 1) < 0.05


def test_int8_crud_and_persistence(rng, tmp_path):
    from vss_tpu.index.dense import HNSWIndex
    from vss_tpu.storage import load_index, save_index

    vecs = rng.uniform(0, 255, (400, 16)).astype(np.float32)
    cfg = HNSWConfig(dims=16, storage_dtype="int8")
    idx = HNSWIndex.build(vecs, cfg, wave_size=128, method="wave")
    idx.delete([1, 2])
    idx.insert(rng.uniform(0, 255, (2, 16)).astype(np.float32), [900, 901])
    p = str(tmp_path / "int8.vss")
    save_index(idx, p)
    idx2 = load_index(p)
    assert idx2.vector_scale == idx.vector_scale
    sd1, r1 = idx.search(vecs[:10], k=3)
    sd2, r2 = idx2.search(vecs[:10], k=3)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_int8_sql_option(rng):
    db = Database()
    db.create_table("t", {"id": np.arange(100),
                          "vec": rng.uniform(0, 255, (100, 8)).astype(np.float32)})
    db.sql("CREATE INDEX qi ON t USING HNSW (vec) WITH (storage = 'int8')")
    assert db.indexes["qi"].index.config.storage_dtype == "int8"
