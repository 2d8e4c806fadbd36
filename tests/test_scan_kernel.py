"""Fused Pallas exact-scan kernel (ops/topk._scan_topk_kernel) vs oracle.

The kernel only lowers on TPU; here it runs under Pallas interpret mode
so its logic (metric epilogues, tombstone masking, NaN queries, tie
breaking, cross-tile merge, beat-skip) stays covered on CPU. The real
lowering is exercised on-chip by the bench and by benchmarks/micro2.py.
"""
import functools

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental import pallas as pl

import vss_tpu.ops.topk as topk_mod


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        topk_mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
    # route bruteforce_topk onto the kernel path despite the CPU backend
    import vss_tpu.utils as utils

    monkeypatch.setattr(utils, "use_pallas", lambda: True)
    # jit caches key on static args only; clear so the patched call takes
    topk_mod._segmin_scan_pallas.clear_cache()
    yield
    topk_mod._segmin_scan_pallas.clear_cache()


def _oracle(q, x, metric, vm):
    if metric == "l2sq":
        D = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    elif metric == "ip":
        D = 1.0 - q @ x.T
    else:
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        xn = np.linalg.norm(x, axis=1, keepdims=True)
        D = 1.0 - (q / np.where(qn > 0, qn, 1)) @ (x / np.where(xn > 0, xn, 1)).T
    D[:, ~vm] = np.inf
    return D


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
def test_kernel_matches_oracle(interpret_pallas, metric):
    rng = np.random.default_rng(3)
    q = rng.normal(size=(16, 64)).astype(np.float32)
    x = rng.normal(size=(1500, 64)).astype(np.float32)
    vm = rng.random(1500) > 0.25
    k = 10
    d, i = topk_mod.bruteforce_topk(
        jnp.asarray(q), jnp.asarray(x), k, metric, valid_mask=jnp.asarray(vm)
    )
    D = _oracle(q, x, metric, vm)
    gt = np.argsort(D, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(i), gt)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(D, gt, axis=1), rtol=2e-5, atol=2e-5
    )


def test_kernel_exact_ties_break_to_lowest_id(interpret_pallas):
    """Duplicated rows spread across segments: top-k must pick the
    lowest slot ids among exact ties (the XLA path's contract)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(700, 32)).astype(np.float32)
    x = base.copy()
    x[600:650] = x[0]  # 51 identical rows, far apart in the table
    q = x[0:8]
    d, i = topk_mod.bruteforce_topk(jnp.asarray(q), jnp.asarray(x), 5, "l2sq")
    i = np.asarray(i)
    assert i[0, 0] == 0 and set(i[0, 1:5].tolist()) == {600, 601, 602, 603}
    np.testing.assert_allclose(np.asarray(d)[0], 0.0, atol=1e-5)


def test_kernel_nan_query_and_k_past_n(interpret_pallas):
    rng = np.random.default_rng(4)
    q = rng.normal(size=(8, 32)).astype(np.float32)
    q[2] = np.nan
    x = rng.normal(size=(12, 32)).astype(np.float32)
    d, i = topk_mod.bruteforce_topk(jnp.asarray(q), jnp.asarray(x), 16, "l2sq")
    d, i = np.asarray(d), np.asarray(i)
    assert np.all(i[2] == -1) and not np.isfinite(d[2]).any()
    # k > n: tail padded with -1/inf
    assert np.all(i[:, 12:] == -1) and not np.isfinite(d[:, 12:]).any()
    gt = np.argsort(((q[0][None] - x) ** 2).sum(-1), kind="stable")
    np.testing.assert_array_equal(i[0, :12], gt)
