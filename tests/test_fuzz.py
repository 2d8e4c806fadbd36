"""Property test: random CRUD interleavings vs a NumPy oracle.

Invariants after every operation batch:
  * every returned rowid exists and is live in the oracle,
  * returned distances equal exact recomputation against the oracle,
  * recall vs the oracle's exact top-k stays above a floor,
  * count bookkeeping matches.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex


D = 16


def exact_topk(oracle: dict, q: np.ndarray, k: int):
    if not oracle:
        return []
    ids = np.fromiter(oracle.keys(), np.int64)
    mat = np.stack([oracle[int(i)] for i in ids])
    d = ((mat.astype(np.float64) - q.astype(np.float64)) ** 2).sum(1)
    order = np.lexsort((ids, d))[:k]
    return ids[order].tolist()


@pytest.mark.slow
def test_random_crud_against_oracle(rng):
    cfg = HNSWConfig(dims=D, m=8, ef_construction=64)
    idx = HNSWIndex(cfg, capacity=64)
    oracle: dict[int, np.ndarray] = {}
    next_id = 0
    checks = 0
    for step in range(60):
        op = rng.choice(["insert", "delete", "compact", "update"],
                        p=[0.55, 0.25, 0.05, 0.15])
        if op == "insert" or not oracle:
            n = int(rng.integers(1, 20))
            vecs = rng.standard_normal((n, D)).astype(np.float32)
            ids = list(range(next_id, next_id + n))
            next_id += n
            idx.insert(vecs, ids)
            for i, r in enumerate(ids):
                oracle[r] = vecs[i]
        elif op == "delete":
            kill = rng.choice(list(oracle), size=min(len(oracle), int(rng.integers(1, 8))), replace=False)
            assert idx.delete([int(r) for r in kill]) == len(kill)
            for r in kill:
                del oracle[int(r)]
        elif op == "compact":
            idx.compact()
        elif op == "update":
            r = int(rng.choice(list(oracle)))
            nv = rng.standard_normal(D).astype(np.float32)
            idx.delete([r])
            idx.insert(nv[None], [r])
            oracle[r] = nv
        assert idx.count == len(oracle), (step, op)

        if oracle and step % 5 == 4:
            checks += 1
            q = rng.standard_normal((3, D)).astype(np.float32)
            k = min(5, len(oracle))
            d, rows = idx.search(q, k=k, ef=64)
            d, rows = np.asarray(d), np.asarray(rows)
            hits = total = 0
            for b in range(3):
                want = exact_topk(oracle, q[b], k)
                got = [int(r) for r in rows[b] if r >= 0]
                # every returned row must be live with a correct distance
                for j, r in enumerate(got):
                    assert r in oracle, (step, r)
                    true_d = float(((oracle[r] - q[b]) ** 2).sum())
                    assert abs(true_d - float(d[b, j])) < 1e-2 + 1e-3 * abs(true_d)
                hits += len(set(got) & set(want))
                total += len(want)
            assert hits / total >= 0.75, f"step {step}: recall {hits}/{total}"
    assert checks >= 10
