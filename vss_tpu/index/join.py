"""Index-to-index matching (usearch `join`, index.hpp:4085-4106 analog).

usearch exposes a stable-marriage pairing between two indexes' members
(never surfaced through the reference's SQL, but part of the core API).
Here: a truncated Gale–Shapley over batched candidate lists — "men" =
rows of index `a`, each proposing to its nearest rows of `b` in order;
"women" = rows of `b`, holding their best proposal so far. All proposal
distances come from one batched search per side.
"""
from __future__ import annotations

import numpy as np

from vss_tpu.index.dense import HNSWIndex

__all__ = ["join_indexes"]


def join_indexes(
    a: HNSWIndex, b: HNSWIndex, proposals: int = 8, ef: int = 0
) -> dict[int, int]:
    """Match rows of `a` to rows of `b` one-to-one.

    Returns {a_rowid: b_rowid}. Rows whose `proposals` nearest candidates
    are all taken by closer proposers stay unmatched — the same truncation
    usearch applies with its bounded candidate lists.
    """
    if a.config.dims != b.config.dims:
        raise ValueError("joined indexes must share dimensionality")
    if a.count == 0 or b.count == 0:
        return {}
    a_rows = np.asarray(sorted(a.rowid_to_slot), np.int64)
    a_vec_slots = np.asarray([a.rowid_to_slot[int(r)] for r in a_rows])
    vecs = np.asarray(a.graph.vectors)[a_vec_slots].astype(np.float32)
    ef = ef or max(b.config.ef_search, proposals)
    d, cand = b.search(vecs, k=proposals, ef=ef)
    d = np.asarray(d)
    cand = np.asarray(cand)

    # Gale–Shapley: iterate proposals in global distance order so each
    # woman keeps her closest proposer (equivalent to round-based GS here).
    order = np.argsort(d, axis=None, kind="stable")
    engaged_b: dict[int, tuple[float, int]] = {}  # b_row -> (dist, a_row)
    engaged_a: dict[int, int] = {}
    nA, P = d.shape
    for flat in order:
        i, j = divmod(int(flat), P)
        b_row = int(cand[i, j])
        if b_row < 0 or not np.isfinite(d[i, j]):
            continue
        a_row = int(a_rows[i])
        if a_row in engaged_a:
            continue
        cur = engaged_b.get(b_row)
        if cur is None:
            engaged_b[b_row] = (float(d[i, j]), a_row)
            engaged_a[a_row] = b_row
        # else: b_row already has a closer proposer (global order) — skip
    return engaged_a
