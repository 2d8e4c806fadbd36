"""Storage-native scan (ops/scan.py) vs the f32 oracle, interpret mode.

The kernel only lowers on TPU; interpret mode keeps the winnow + rescore
+ rerank logic covered on CPU. Real lowering is exercised on-chip by the
bench and benchmarks/micro_scan.py.
"""
import functools

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental import pallas as pl

import vss_tpu.ops.scan as scan_mod


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        scan_mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
    import vss_tpu.utils as utils

    monkeypatch.setattr(utils, "use_pallas", lambda: True)
    scan_mod._native_segmin_scan.clear_cache()
    yield
    scan_mod._native_segmin_scan.clear_cache()


def _oracle_ids(q, x, metric, vm, k):
    if metric == "l2sq":
        D = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    elif metric == "ip":
        D = 1.0 - q @ x.T
    else:
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        xn = np.linalg.norm(x, axis=1, keepdims=True)
        D = 1.0 - (q / np.where(qn > 0, qn, 1)) @ (
            x / np.where(xn > 0, xn, 1)
        ).T
    D[:, ~vm] = np.inf
    return np.sort(D, axis=1)[:, :k], np.argsort(D, kind="stable", axis=1)[:, :k]


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_native_scan_matches_oracle(interpret_pallas, metric, dtype):
    rng = np.random.default_rng(7)
    n, d, nq, k = 4096, 64, 16, 5
    if dtype == "int8":
        xf = rng.integers(-127, 128, (n, d)).astype(np.float32)
        tape = jnp.asarray(xf, jnp.int8)
    else:
        xf = np.asarray(
            jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16),
            np.float32,
        )
        tape = jnp.asarray(xf, jnp.bfloat16)
    q = rng.normal(size=(nq, d)).astype(np.float32) * 20
    vm = np.ones(n, bool)
    vm[rng.choice(n, 200, replace=False)] = False
    rr = jnp.asarray(xf)  # side tape == exact stored values
    gd, gi = _oracle_ids(q, xf, metric, vm, k)
    d_out, i_out = scan_mod.scan_topk(
        jnp.asarray(q), tape, k, metric,
        valid_mask=jnp.asarray(vm), rerank_tape=rr,
    )
    d_out, i_out = np.asarray(d_out), np.asarray(i_out)
    # exact distances (rerank is f32 on the true values) and >= 99% of
    # ids match (bf16 winnow can swap exact ties)
    np.testing.assert_allclose(d_out, gd, rtol=1e-5, atol=1e-4)
    agree = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(i_out, gi)
    ])
    assert agree >= 0.99, agree


def test_native_scan_no_rerank_tape(interpret_pallas):
    rng = np.random.default_rng(3)
    n, d, nq, k = 2048, 32, 8, 3
    xf = rng.integers(-100, 100, (n, d)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32) * 10
    gd, gi = _oracle_ids(q, xf, "l2sq", np.ones(n, bool), k)
    d_out, i_out = scan_mod.scan_topk(
        jnp.asarray(q), jnp.asarray(xf, jnp.int8), k, "l2sq"
    )
    np.testing.assert_allclose(np.asarray(d_out), gd, rtol=1e-5, atol=1e-4)
    assert (np.asarray(i_out) == gi).mean() > 0.99


def test_native_scan_falls_back_small():
    # tiny corpus routes to bruteforce_topk regardless of backend
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 16)).astype(np.float32)
    q = x[:4]
    d, i = scan_mod.scan_topk(jnp.asarray(q), jnp.asarray(x), 1, "l2sq")
    assert (np.asarray(i)[:, 0] == np.arange(4)).all()
