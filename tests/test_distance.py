"""Distance kernel correctness vs. NumPy reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.ops import Metric, bruteforce_topk, gathered_distances, merge_topk, pairwise


def np_pairwise(q, x, metric):
    q = q.astype(np.float64)
    x = x.astype(np.float64)
    dots = q @ x.T
    qn = (q * q).sum(-1, keepdims=True)
    xn = (x * x).sum(-1, keepdims=True).T
    if metric == "l2sq":
        return np.maximum(qn + xn - 2 * dots, 0.0)
    if metric == "cosine":
        denom = np.sqrt(qn * xn)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
        d = 1.0 - cos
        return np.where((qn == 0) & (xn == 0), 0.0, d)
    if metric == "ip":
        return 1.0 - dots
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
@pytest.mark.parametrize("shape", [(7, 33, 5), (64, 200, 128), (3, 1000, 960)])
def test_pairwise_matches_numpy(rng, metric, shape):
    nq, nx, d = shape
    q = rng.standard_normal((nq, d)).astype(np.float32)
    x = rng.standard_normal((nx, d)).astype(np.float32)
    got = np.asarray(pairwise(jnp.asarray(q), jnp.asarray(x), metric))
    want = np_pairwise(q, x, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * d)


def test_cosine_zero_vector_guards():
    q = np.array([[0.0, 0.0], [1.0, 0.0]], np.float32)
    x = np.array([[0.0, 0.0], [0.0, 1.0]], np.float32)
    d = np.asarray(pairwise(jnp.asarray(q), jnp.asarray(x), "cosine"))
    assert d[0, 0] == 0.0  # both zero
    assert d[0, 1] == 1.0  # one zero
    assert abs(d[1, 1] - 1.0) < 1e-6  # orthogonal


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
def test_bruteforce_topk_exact(rng, metric):
    nq, nx, d, k = 17, 3000, 64, 10
    q = rng.standard_normal((nq, d)).astype(np.float32)
    x = rng.standard_normal((nx, d)).astype(np.float32)
    dists, ids = bruteforce_topk(jnp.asarray(q), jnp.asarray(x), k, metric)
    dists, ids = np.asarray(dists), np.asarray(ids)
    want = np_pairwise(q, x, metric)
    want_ids = np.argsort(want, axis=1, kind="stable")[:, :k]
    assert set(map(tuple, ids)) == set(map(tuple, want_ids))
    np.testing.assert_allclose(
        dists, np.take_along_axis(want, want_ids, 1), rtol=1e-4, atol=1e-3
    )
    # ascending order
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_bruteforce_topk_mask(rng):
    nq, nx, d, k = 4, 500, 16, 5
    q = rng.standard_normal((nq, d)).astype(np.float32)
    x = rng.standard_normal((nx, d)).astype(np.float32)
    mask = np.ones(nx, bool)
    # Tombstone the true nearest neighbor of query 0.
    full = np_pairwise(q, x, "l2sq")
    nn0 = int(np.argmin(full[0]))
    mask[nn0] = False
    dists, ids = bruteforce_topk(
        jnp.asarray(q), jnp.asarray(x), k, "l2sq", valid_mask=jnp.asarray(mask)
    )
    assert nn0 not in np.asarray(ids)[0]


def test_bruteforce_topk_k_exceeds_n(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    dists, ids = bruteforce_topk(jnp.asarray(q), jnp.asarray(x), 5, "l2sq")
    assert np.asarray(ids).shape == (2, 5)
    assert np.all(np.asarray(ids)[:, 3:] == -1)
    assert np.all(np.isinf(np.asarray(dists)[:, 3:]))


def test_merge_topk(rng):
    nq, k, shards = 5, 4, 3
    d = rng.standard_normal((nq, shards * k)).astype(np.float32)
    i = rng.integers(0, 10_000, (nq, shards * k)).astype(np.int32)
    md, mi = merge_topk(jnp.asarray(d), jnp.asarray(i), k)
    order = np.argsort(d, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(md), np.take_along_axis(d, order, 1), rtol=1e-6)


def test_gathered_distances(rng):
    b, c, d = 6, 9, 32
    q = rng.standard_normal((b, d)).astype(np.float32)
    cv = rng.standard_normal((b, c, d)).astype(np.float32)
    got = np.asarray(gathered_distances(jnp.asarray(q), jnp.asarray(cv), "l2sq"))
    for bi in range(b):
        want = np_pairwise(q[bi : bi + 1], cv[bi], "l2sq")[0]
        np.testing.assert_allclose(got[bi], want, rtol=1e-4, atol=1e-3)
