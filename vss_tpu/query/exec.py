"""Physical plan execution.

Execution model: a plan runs to a single result chunk (dict of NumPy
columns). The heavy operators dispatch to the device kernels —
`HNSW_INDEX_SCAN` runs the batched beam search and then fetches base rows
by rowid exactly like the reference scan function
(`/root/reference/src/hnsw/hnsw_index_scan.cpp:95-121`: the index yields
row-ids only; visible distances are recomputed by projections);
`BRUTE_FORCE_TOPK` runs the MXU distance tiles; `HNSW_INDEX_JOIN` batches
all outer rows through one multi-query search (the reference does
STANDARD_VECTOR_SIZE/k rows per batch, `hnsw_optimize_join.cpp:135` — a
CPU chunking concern; on TPU the whole outer side is one batch, bucketed
to bound recompilation).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vss_tpu.ops.topk import bruteforce_topk
from vss_tpu.query.functions import resolve_function
from vss_tpu.query.ir import (
    BruteForceTopK,
    Filter,
    HNSWIndexJoinNode,
    HNSWIndexScan,
    KNNJoin,
    Limit,
    MinByAgg,
    PlanNode,
    Projection,
    Scan,
    TopK,
)
from vss_tpu.query.table import Database

__all__ = ["run_plan", "explain_analyze"]


def _is_null(vals: np.ndarray) -> np.ndarray:
    if vals.dtype.kind == "f":
        nan = np.isnan(vals)
        return nan.any(axis=1) if vals.ndim == 2 else nan
    if vals.dtype == object:
        return np.asarray([v is None for v in vals])
    return np.zeros(len(vals), bool)


from vss_tpu.utils import next_pow2 as _bucket


def _search_index(
    db: Database, index_name: str, queries: np.ndarray, k: int,
    filter_mask=None,
):
    """Batched index search with ef from the hnsw_ef_search setting
    (`hnsw_index.cpp:318-329`: per-scan ef = max(setting, index default))."""
    entry = db.indexes[index_name]
    setting = int(db.settings.get("hnsw_ef_search") or 0)
    ef = max(setting, entry.index.config.ef_search, k)
    B = queries.shape[0]
    Bp = _bucket(B)
    qp = np.zeros((Bp, queries.shape[1]), np.float32)
    qp[:B] = queries
    d, rows = entry.index.search(qp, k=k, ef=ef, filter_mask=filter_mask)
    return np.asarray(d)[:B], np.asarray(rows)[:B]


def explain_analyze(db: Database, node: PlanNode) -> tuple[str, dict]:
    """Run the plan with per-operator wall time + row counts (the EXPLAIN
    ANALYZE surface the reference gets from DuckDB). Returns (report text,
    result chunk)."""
    import time

    timings: dict[int, tuple[float, int]] = {}

    def timed_run(n: PlanNode) -> dict[str, np.ndarray]:
        t0 = time.perf_counter()
        out = _run_plan_inner(db, n, timed_run)
        dt = time.perf_counter() - t0
        rows = len(next(iter(out.values()))) if out else 0
        timings[id(n)] = (dt, rows)
        return out

    result = timed_run(node)

    def fmt(n: PlanNode, depth: int) -> list[str]:
        dt, rows = timings.get(id(n), (0.0, 0))
        own = dt - sum(timings.get(id(c), (0.0, 0))[0] for c in n.children())
        lines = [
            "  " * depth
            + f"{n.label()}  [{own * 1e3:.2f}ms, {rows} rows]"
        ]
        for c in n.children():
            lines.extend(fmt(c, depth + 1))
        return lines

    return "\n".join(fmt(node, 0)), result


def run_plan(db: Database, node: PlanNode) -> dict[str, np.ndarray]:
    def run(n):
        return run_plan(db, n)

    return _run_plan_inner(db, node, run)


def _run_plan_inner(db: Database, node: PlanNode, run) -> dict[str, np.ndarray]:
    if isinstance(node, Scan):
        return db.table(node.table).chunk()

    from vss_tpu.query.ir import ChunkSource, GroupByAggregate, SimpleAggregate

    if isinstance(node, ChunkSource):
        return dict(node.data)

    if isinstance(node, GroupByAggregate):
        chunk = run(node.child)
        n = len(next(iter(chunk.values()))) if chunk else 0
        # factorize composite group keys
        codes = np.zeros(n, np.int64)
        uniques = []
        for key in node.keys:
            u, inv = np.unique(np.asarray(chunk[key]), return_inverse=True)
            codes = codes * (len(u) + 1) + inv
            uniques.append((key, u, inv))
        group_codes, first_pos, ginv = np.unique(
            codes, return_index=True, return_inverse=True
        )
        out: dict[str, np.ndarray] = {
            key: np.asarray(chunk[key])[first_pos] for key in node.keys
        }
        n_groups = len(group_codes)
        for name, (fn, arg) in node.items.items():
            if fn == "count" and arg is None:
                out[name] = np.bincount(ginv, minlength=n_groups)
                continue
            vals = np.asarray(arg.evaluate(chunk), np.float64)
            # SQL aggregate semantics: NULLs (NaN-encoded) are skipped;
            # a group whose inputs are all NULL aggregates to NULL (NaN)
            null = _is_null(vals)
            nn = np.bincount(
                ginv, weights=(~null).astype(np.float64), minlength=n_groups
            )
            if fn == "count":
                out[name] = nn.astype(np.int64)
            elif fn == "sum":
                s = np.bincount(
                    ginv, weights=np.where(null, 0.0, vals), minlength=n_groups
                )
                out[name] = np.where(nn > 0, s, np.nan)
            elif fn == "avg":
                s = np.bincount(
                    ginv, weights=np.where(null, 0.0, vals), minlength=n_groups
                )
                out[name] = np.where(nn > 0, s / np.maximum(nn, 1), np.nan)
            elif fn in ("min", "max"):
                red = np.full(n_groups, np.inf if fn == "min" else -np.inf)
                ufn = np.minimum if fn == "min" else np.maximum
                masked = np.where(null, np.inf if fn == "min" else -np.inf, vals)
                ufn.at(red, ginv, masked)
                out[name] = np.where(nn > 0, red, np.nan)
            else:
                raise NotImplementedError(f"aggregate '{fn}'")
        return out

    if isinstance(node, SimpleAggregate):
        chunk = run(node.child)
        n = len(next(iter(chunk.values()))) if chunk else 0
        out = {}
        for name, (fn, arg) in node.items.items():
            if fn == "count" and arg is None:
                out[name] = np.asarray([n])
                continue
            vals = np.asarray(arg.evaluate(chunk)) if n else np.asarray([])
            if fn == "count":
                out[name] = np.asarray([int(np.sum(~_is_null(vals)))])
                continue
            # SQL semantics: skip NULLs; empty / all-NULL input -> NULL
            nonnull = vals[~_is_null(vals)] if n else vals
            m = len(nonnull)
            if fn == "sum":
                out[name] = np.asarray([nonnull.sum() if m else None])
            elif fn == "avg":
                out[name] = np.asarray([nonnull.mean() if m else None])
            elif fn == "min":
                out[name] = np.asarray([nonnull.min() if m else None])
            elif fn == "max":
                out[name] = np.asarray([nonnull.max() if m else None])
            else:
                raise NotImplementedError(f"aggregate '{fn}'")
        return out

    if isinstance(node, Filter):
        chunk = run(node.child)
        mask = np.asarray(node.predicate.evaluate(chunk), bool)
        return {c: v[mask] for c, v in chunk.items()}

    if isinstance(node, Projection):
        chunk = run(node.child)
        return {name: np.asarray(e.evaluate(chunk)) for name, e in node.exprs.items()}

    if isinstance(node, Limit):
        chunk = run(node.child)
        return {c: v[: node.k] for c, v in chunk.items()}

    if isinstance(node, TopK):
        chunk = run(node.child)
        keys = np.asarray(node.order.evaluate(chunk), np.float64)
        order = np.lexsort(
            (chunk.get("__rowid__", np.arange(len(keys))), keys)
        )
        if not node.ascending:
            order = np.lexsort(
                (chunk.get("__rowid__", np.arange(len(keys))), -keys)
            )
        order = order[: node.k]
        return {c: v[order] for c, v in chunk.items()}

    if isinstance(node, MinByAgg):
        chunk = run(node.child)
        keys = np.asarray(node.order.evaluate(chunk), np.float64)
        order = np.lexsort(
            (chunk.get("__rowid__", np.arange(len(keys))), keys)
        )[: node.k]
        vals = np.asarray(node.value.evaluate(chunk))[order]
        return {node.output: np.asarray([vals.tolist()], dtype=object)}

    if isinstance(node, HNSWIndexScan):
        entry = db.indexes[node.index_name]
        t = db.table(node.table)
        q = np.asarray(node.query, np.float32)[None, :]
        filter_mask = None
        if node.pushed_filter is not None:
            # evaluate predicate over the table, lift to a slot mask
            chunk = t.chunk()
            ok = np.asarray(node.pushed_filter.evaluate(chunk), bool)
            allowed = set(chunk["__rowid__"][ok].tolist())
            srow = np.asarray(entry.index.graph.slot_to_rowid)
            mask = np.fromiter(
                (int(r) in allowed for r in srow), bool, len(srow)
            )
            filter_mask = jnp.asarray(mask)
        _, rows = _search_index(
            db, node.index_name, q, node.k, filter_mask=filter_mask
        )
        rows = rows[0]
        return t.fetch(rows[rows >= 0])

    if isinstance(node, BruteForceTopK):
        t = db.table(node.table)
        vecs, valid = t.device_column(node.column)
        fdef = resolve_function(node.metric_function)
        q = jnp.asarray(np.asarray(node.query, np.float32)[None, :])
        d, slots = bruteforce_topk(
            q, vecs, node.k, fdef.index_metric, valid_mask=valid
        )
        slots = np.asarray(slots)[0]
        rows = t.rowids[slots[slots >= 0]]
        return t.fetch(rows)

    if isinstance(node, HNSWIndexJoinNode):
        left = run(node.left)
        entry = db.indexes[node.index_name]
        t = db.table(node.table)
        queries = np.asarray(node.left_vector.evaluate(left), np.float32)
        if queries.ndim != 2:
            raise ValueError("knn join left vector must evaluate to [n, d]")
        nL = queries.shape[0]
        if nL == 0:
            out = {f"l_{c}": v[:0] for c, v in left.items()}
            out.update({f"r_{c}": v[:0] for c, v in t.chunk().items()})
            out["row_number"] = np.zeros(0, np.int64)
            return out
        _, rows = _search_index(
            db, node.index_name, np.nan_to_num(queries), node.k
        )
        # NULL outer vectors produce no matches
        rows = np.where(np.isnan(queries).any(1)[:, None], -1, rows)
        # expand: left row i repeated per valid match, with 1-based rank
        # (the reference emits a row_number column, hnsw_optimize_join.cpp:130)
        valid = rows >= 0
        counts = valid.sum(1)
        left_sel = np.repeat(np.arange(nL), counts)
        flat_rows = rows[valid]
        ranks = np.concatenate([np.arange(1, c + 1) for c in counts]) if nL else []
        out = {f"l_{c}": v[left_sel] for c, v in left.items()}
        inner = t.fetch(flat_rows)
        for c, v in inner.items():
            out[f"r_{c}"] = v
        out["row_number"] = np.asarray(ranks, np.int64)
        return out

    if isinstance(node, KNNJoin):
        # brute-force fallback join (no usable index)
        left = run(node.left)
        t = db.table(node.right_table)
        queries = np.asarray(node.left_vector.evaluate(left), np.float32)
        vecs, valid = t.device_column(node.right_column)
        fdef = resolve_function(node.metric_function)
        nL = queries.shape[0]
        if nL == 0:
            out = {f"l_{c}": v[:0] for c, v in left.items()}
            out.update({f"r_{c}": v[:0] for c, v in t.chunk().items()})
            out["row_number"] = np.zeros(0, np.int64)
            return out
        Bp = _bucket(nL)
        qp = np.zeros((Bp, queries.shape[1]), np.float32)
        qp[:nL] = np.nan_to_num(queries)
        d, slots = bruteforce_topk(
            jnp.asarray(qp), vecs, node.k, fdef.index_metric, valid_mask=valid
        )
        slots = np.asarray(slots)[:nL]
        slots = np.where(np.isnan(queries).any(1)[:, None], -1, slots)
        valid_m = slots >= 0
        counts = valid_m.sum(1)
        left_sel = np.repeat(np.arange(nL), counts)
        flat_slots = slots[valid_m]
        rows = t.rowids[flat_slots]
        ranks = np.concatenate([np.arange(1, c + 1) for c in counts]) if nL else []
        out = {f"l_{c}": v[left_sel] for c, v in left.items()}
        inner = t.fetch(rows)
        for c, v in inner.items():
            out[f"r_{c}"] = v
        out["row_number"] = np.asarray(ranks, np.int64)
        return out

    raise NotImplementedError(f"cannot execute {type(node).__name__}")
