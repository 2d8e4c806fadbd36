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
