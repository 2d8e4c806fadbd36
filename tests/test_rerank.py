"""Exact-rescore (rerank) side tape for quantized storage.

The reference's tape is always FLOAT (`hnsw_index.cpp:277-290`), so it has
no rerank stage; this is the TPU-native recall-recovery mechanism for the
int8 tape (config.rerank, `index/search.py` rerank block): the beam runs
over the 4x-smaller quantized tape, then the ef-wide result pool is
re-scored once against a full-precision side tape. Test strategy follows
SURVEY §4: brute-force-oracle parity plus persistence round-trips.
"""
import numpy as np
import pytest

from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex


def _clustered(n, d, seed=0, n_centers=32):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 255, (n_centers, d))
    x = centers[rng.integers(0, n_centers, n)] + rng.normal(0, 25, (n, d))
    return np.clip(x, 0, 255).astype(np.float32)


def _recall(idx, queries, gt, k, ef):
    _, rows = idx.search(queries, k=k, ef=ef)
    rows = np.asarray(rows)
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b.tolist()))
        for a, b in zip(rows, gt)
    )
    return hits / gt.size


def _gt(vecs, queries, k):
    d = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_rerank_tape_allocated_for_int8_only():
    cfg8 = HNSWConfig(dims=16, storage_dtype="int8")
    cfg32 = HNSWConfig(dims=16)
    x = _clustered(256, 16)
    i8 = HNSWIndex.build(x, cfg8, method="exact")
    f32 = HNSWIndex.build(x, cfg32, method="exact")
    assert i8.rerank_tape is not None
    assert i8.rerank_tape.shape == i8.graph.vectors.shape
    assert f32.rerank_tape is None  # auto resolves to none for f32
    off = HNSWIndex.build(
        x, HNSWConfig(dims=16, storage_dtype="int8", rerank="none"),
        method="exact",
    )
    assert off.rerank_tape is None


def test_rerank_recovers_int8_recall():
    n, d, k, nq = 4000, 32, 10, 64
    x = _clustered(n, d, seed=1)
    rng = np.random.default_rng(2)
    q = x[rng.choice(n, nq, replace=False)] + rng.normal(0, 10, (nq, d)).astype(
        np.float32
    )
    q = np.clip(q, 0, 255).astype(np.float32)
    gt = _gt(x, q, k)
    base = HNSWIndex.build(
        x, HNSWConfig(dims=d, storage_dtype="int8", rerank="none"), method="exact"
    )
    rr = HNSWIndex.build(
        x, HNSWConfig(dims=d, storage_dtype="int8"), method="exact"
    )
    r_none = _recall(base, q, gt, k, ef=48)
    r_rr = _recall(rr, q, gt, k, ef=48)
    # the rescored pool can only re-order admissions, never lose them
    assert r_rr >= r_none - 1e-9
    assert r_rr >= 0.9


def test_rerank_distances_are_exact():
    """Rescored output distances come from the side tape: for byte data
    they match the f32 oracle exactly (after the scale mapping), with no
    int8 rounding error."""
    n, d, k = 1000, 24, 5
    x = _clustered(n, d, seed=3)
    q = x[:8] + 1.0
    idx = HNSWIndex.build(
        x, HNSWConfig(dims=d, storage_dtype="int8"), method="exact"
    )
    dists, rows = idx.search(q, k=k, ef=64)
    dists, rows = np.asarray(dists), np.asarray(rows)
    for b in range(q.shape[0]):
        for j in range(k):
            if rows[b, j] < 0:
                continue
            exact = float(((q[b] - x[rows[b, j]]) ** 2).sum())
            assert dists[b, j] == pytest.approx(exact, rel=1e-4)


def test_rerank_tape_follows_insert_delete_compact():
    d, k = 16, 5
    x = _clustered(600, d, seed=4)
    idx = HNSWIndex.build(
        x[:400], HNSWConfig(dims=d, storage_dtype="int8"), method="exact"
    )
    idx.insert(x[400:], rowids=np.arange(400, 600))
    assert idx.rerank_tape.shape[0] == idx.graph.capacity
    idx.delete(list(range(0, 600, 3)))
    idx.compact()
    assert idx.rerank_tape.shape[0] == idx.graph.capacity
    alive = np.array([i for i in range(600) if i % 3 != 0])
    gt_local = _gt(x[alive], x[alive[:32]], k)
    _, rows = idx.search(x[alive[:32]], k=k, ef=96)
    rows = np.asarray(rows)
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(alive[b].tolist()))
        for a, b in zip(rows, gt_local)
    )
    assert hits / gt_local.size >= 0.9
    # the permuted side tape must still mirror the quantized tape's slots:
    # slot s of both tapes holds the same (scaled) vector
    tape = np.asarray(idx.rerank_tape[: idx.next_slot])
    quant = np.asarray(idx.graph.vectors[: idx.next_slot]).astype(np.float32)
    assert np.abs(tape - quant).max() <= 0.5 + 1e-6  # int8 rounding bound


def test_rerank_tape_checkpoint_roundtrip(tmp_path):
    from vss_tpu.storage.serialize import load_index, save_index

    d = 16
    x = _clustered(300, d, seed=5)
    idx = HNSWIndex.build(
        x, HNSWConfig(dims=d, storage_dtype="int8"), method="exact"
    )
    p = str(tmp_path / "idx.bin")
    save_index(idx, p)
    for view in (False, True):
        idx2 = load_index(p, view=view)
        assert idx2.rerank_tape is not None
        d1, r1 = idx.search(x[:16], k=5, ef=64)
        d2, r2 = idx2.search(x[:16], k=5, ef=64)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=1e-6
        )


def test_scale_drift_guard_and_requantize():
    """Inserts 10x out of the build-time int8 range must set the stats
    drift flag; compact() requantizes from the f32 side tape and restores
    recall on the shifted data (VERDICT r2 #9; guards dense.py insert
    clipping)."""
    n, d, k = 1500, 24, 5
    x = _clustered(n, d, seed=7)
    idx = HNSWIndex.build(
        x, HNSWConfig(dims=d, storage_dtype="int8"), method="exact"
    )
    st = idx.stats()["quantization"]
    assert not st["scale_drift"] and st["out_of_range_inserts"] == 0
    # a 10x-magnitude cluster far outside the build distribution
    rng = np.random.default_rng(11)
    big = (2000.0 + rng.normal(0, 25, (200, d))).astype(np.float32)
    idx.insert(big, rowids=np.arange(n, n + 200))
    st = idx.stats()["quantization"]
    assert st["scale_drift"] and st["out_of_range_inserts"] == 200
    assert st["max_abs_seen"] >= 1900.0
    # pre-requantize, all big rows clip to the same +127 corner: searching
    # near one of them cannot separate them. compact() must fix that.
    old_scale = idx.vector_scale
    idx.compact()
    assert idx.vector_scale > old_scale
    st = idx.stats()["quantization"]
    assert not st["scale_drift"] and st["out_of_range_inserts"] == 0
    gt = _gt(big, big[:16], k) + n
    _, rows = idx.search(big[:16], k=k, ef=96)
    rows = np.asarray(rows)
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b.tolist()))
        for a, b in zip(rows, gt)
    )
    assert hits / gt.size >= 0.9
    # original corpus still searchable after requantization
    gt0 = _gt(x, x[:16], k)
    _, rows0 = idx.search(x[:16], k=k, ef=96)
    rows0 = np.asarray(rows0)
    hits0 = sum(
        len(set(a[a >= 0].tolist()) & set(b.tolist()))
        for a, b in zip(rows0, gt0)
    )
    assert hits0 / gt0.size >= 0.9
