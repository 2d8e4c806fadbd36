"""NN-descent candidate refinement (index/nn_descent.py).

The round-3 finding it exists for: IVF-window candidate lists collapse on
flat (iid) distributions. These tests pin (a) convergence from an
adversarial (random) seed, (b) the exact_knn output contract, (c) the
adaptive trigger skipping work when the lists are already good.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index.nn_descent import nn_descent_refine, sampled_list_recall
from vss_tpu.ops.distance import gathered_distances


def _random_seed_lists(xv, C, rng):
    """Adversarial seed: uniformly random candidate ids (what IVF lists
    degenerate to on iid data), distances scored honestly, sorted."""
    n = xv.shape[0]
    ci = rng.integers(0, n, (n, C)).astype(np.int32)
    ci = np.where(ci == np.arange(n)[:, None], (ci + 1) % n, ci)
    cd = np.asarray(
        gathered_distances(xv, jnp.take(xv, jnp.asarray(ci), axis=0), "l2sq")
    )
    order = np.argsort(cd, axis=1)
    return (
        jnp.asarray(np.take_along_axis(cd, order, 1)),
        jnp.asarray(np.take_along_axis(ci, order, 1)),
    )


@pytest.fixture(scope="module")
def iid_case():
    rng = np.random.default_rng(0)
    n, d, C = 6144, 32, 24
    xv = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    cd, ci = _random_seed_lists(xv, C, rng)
    return xv, cd, ci


def test_converges_from_random_seed(iid_case):
    xv, cd, ci = iid_case
    rec0, _, _ = sampled_list_recall(xv, ci, "l2sq", n_sample=256, seed=1)
    nd, ni = nn_descent_refine(
        xv, cd, ci, "l2sq", chunk=1024, max_rounds=6, target_recall=0.92,
        seed=3,
    )
    rec1, _, _ = sampled_list_recall(xv, ni, "l2sq", n_sample=256, seed=1)
    assert rec0 < 0.05  # the seed really was garbage
    assert rec1 >= 0.85, f"NN-descent failed to converge: {rec0} -> {rec1}"


def test_output_contract(iid_case):
    xv, cd, ci = iid_case
    n = xv.shape[0]
    nd, ni = nn_descent_refine(
        xv, cd, ci, "l2sq", chunk=1024, max_rounds=2, target_recall=0.99,
        seed=3,
    )
    nd, ni = np.asarray(nd), np.asarray(ni)
    assert nd.shape == cd.shape and ni.shape == ci.shape
    assert nd.dtype == np.float32 and ni.dtype == np.int32
    # no self-matches, ids in range, -1 exactly where dist is inf
    assert not (ni == np.arange(n)[:, None]).any()
    assert ni.max() < n
    assert ((ni >= 0) == np.isfinite(nd)).all()
    # ascending within the finite prefix
    f = np.where(np.isfinite(nd), nd, np.inf)
    assert (np.diff(f, axis=1) >= -1e-4).all()
    # no duplicate ids within a row
    for r in range(0, n, 997):
        live = ni[r][ni[r] >= 0]
        assert len(set(live.tolist())) == len(live)


def test_refined_lists_subsume_seed_quality(iid_case):
    """Merging never loses a neighbor the seed already had: every seed id
    that is a true top-C entry stays (distances are re-compared, equal
    for identical ids)."""
    xv, cd, ci = iid_case
    nd, ni = nn_descent_refine(
        xv, cd, ci, "l2sq", chunk=1024, max_rounds=1, target_recall=0.99,
        seed=3,
    )
    nd = np.asarray(nd)
    cd0 = np.asarray(cd)
    # per-row: refined worst-kept distance <= seed worst-kept distance
    worst_new = np.where(np.isfinite(nd), nd, -np.inf).max(axis=1)
    worst_old = np.where(np.isfinite(cd0), cd0, -np.inf).max(axis=1)
    assert (worst_new <= worst_old + 1e-3).all()


def test_adaptive_trigger_skips_good_lists():
    """Lists already above target come back IDENTICAL (no rounds run)."""
    from vss_tpu.index.exact_build import exact_knn

    rng = np.random.default_rng(2)
    n, d, C = 5000, 16, 12
    xv = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ids = jnp.arange(n, dtype=jnp.int32)
    cd, ci = exact_knn(xv, ids, C, "l2sq")
    nd, ni = nn_descent_refine(
        xv, cd, ci, "l2sq", chunk=1024, max_rounds=6, target_recall=0.9,
        seed=3,
    )
    assert nd is cd and ni is ci


def test_tiny_input_passthrough():
    rng = np.random.default_rng(4)
    xv = jnp.asarray(rng.standard_normal((100, 8)).astype(np.float32))
    cd = jnp.zeros((100, 4), jnp.float32)
    ci = jnp.zeros((100, 4), jnp.int32)
    nd, ni = nn_descent_refine(xv, cd, ci, "l2sq", chunk=1024)
    assert nd is cd and ni is ci
