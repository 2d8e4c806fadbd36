"""Sharded exact MXU build (parallel/sharded_build.py): recall parity
with the single-shard exact builder on the virtual CPU mesh."""
import numpy as np
import jax.numpy as jnp

from vss_tpu.index.dense import HNSWIndex
from vss_tpu.index.graph import HNSWConfig
from vss_tpu.ops.topk import bruteforce_topk
from vss_tpu.parallel.mesh import make_mesh
from vss_tpu.parallel.sharded import ShardedHNSWIndex


def _recall(idx, vecs, q, k=10, ef=64):
    gt = np.asarray(bruteforce_topk(jnp.asarray(q), jnp.asarray(vecs), k, "l2sq")[1])
    _, rows = idx.search(q, k=k, ef=ef)
    rows = np.asarray(rows)
    return np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(rows, gt)
    ])


def test_sharded_exact_build_recall_parity():
    rng = np.random.default_rng(11)
    n, d = 4096, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    q = vecs[rng.integers(0, n, 64)] + rng.normal(0, 0.05, (64, d)).astype(
        np.float32
    )
    cfg = HNSWConfig(dims=d, metric="l2sq")
    sh = ShardedHNSWIndex.build(vecs, cfg, make_mesh(4), method="exact")
    assert sh.count == n
    rec_sh = _recall(sh, vecs, q)
    single = HNSWIndex.build(vecs, cfg, method="exact")
    _, rows1 = single.search(q, k=10, ef=64)
    gt = np.asarray(bruteforce_topk(jnp.asarray(q), jnp.asarray(vecs), 10, "l2sq")[1])
    rec_1 = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(rows1), gt)
    ])
    # sharded search merges 4 independent shards' top-k: recall should be
    # at least the single graph's (each shard scans 1/4 the rows at the
    # same ef) minus small slack
    assert rec_sh >= rec_1 - 0.02, (rec_sh, rec_1)
    assert rec_sh >= 0.9, rec_sh


def test_sharded_exact_build_then_crud():
    rng = np.random.default_rng(3)
    n, d = 1024, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric="l2sq")
    sh = ShardedHNSWIndex.build(vecs, cfg, make_mesh(4), method="exact")
    # insert on top of an exact-built index uses the wave path
    extra = rng.normal(size=(32, d)).astype(np.float32)
    sh.insert(extra, rowids=np.arange(n, n + 32))
    assert sh.count == n + 32
    deleted = sh.delete(list(range(0, 64)))
    assert deleted == 64
    q = vecs[100:108]
    _, rows = sh.search(q, k=5, ef=48)
    rows = np.asarray(rows)
    assert (rows[rows >= 0] >= 64).all()
    # self-match should survive for non-deleted queries
    hits = sum(100 + i in set(r.tolist()) for i, r in enumerate(rows))
    assert hits >= 7


def test_sharded_exact_uneven_shards():
    # n not divisible by S: last shards get one fewer row
    rng = np.random.default_rng(5)
    n, d = 1001, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric="l2sq")
    sh = ShardedHNSWIndex.build(vecs, cfg, make_mesh(4), method="exact")
    assert sh.count == n
    q = vecs[:16]
    _, rows = sh.search(q, k=1, ef=32)
    assert (np.asarray(rows)[:, 0] == np.arange(16)).mean() >= 0.95


def test_sharded_exact_int8_storage():
    rng = np.random.default_rng(9)
    n, d = 2048, 24
    vecs = rng.integers(0, 200, (n, d)).astype(np.float32)
    cfg = HNSWConfig(dims=d, metric="l2sq", storage_dtype="int8")
    sh = ShardedHNSWIndex.build(vecs, cfg, make_mesh(4), method="exact")
    q = vecs[rng.integers(0, n, 32)].astype(np.float32)
    rec = _recall(sh, vecs, q, k=10, ef=64)
    assert rec >= 0.85, rec
