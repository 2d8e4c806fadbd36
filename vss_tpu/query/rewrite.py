"""Optimizer rewrite rules.

The four plan rewrites the reference installs as DuckDB optimizer
extensions, re-expressed over our IR:

  1. expression rule: (1.0 - array_cosine_similarity(a, b)) ->
     array_cosine_distance(a, b)                (hnsw_optimize_expr.cpp)
  2. TopN -> HNSW_INDEX_SCAN                    (hnsw_optimize_scan.cpp)
  3. min_by(col, dist, k) -> index scan          (hnsw_optimize_topk.cpp)
  4. k-NN lateral join -> HNSW_INDEX_JOIN        (hnsw_optimize_join.cpp)

plus one TPU-native extra with no reference counterpart: an un-indexed
TopN over a distance expression lowers to the exact brute-force operator
(`BruteForceTopK`) that runs the MXU distance tiles, instead of a scalar
sort. Filters under a rewritten TopN are pulled up above the index scan,
matching the reference's post-filter semantics
(`hnsw_optimize_scan.cpp:168-198`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from vss_tpu.ops.distance import Metric
from vss_tpu.query.functions import resolve_function
from vss_tpu.query.ir import (
    BinOp,
    BruteForceTopK,
    ColumnRef,
    Const,
    Expr,
    Filter,
    Func,
    HNSWIndexJoinNode,
    HNSWIndexScan,
    KNNJoin,
    MinByAgg,
    Not,
    PlanNode,
    Projection,
    Scan,
    TopK,
)
from vss_tpu.query.table import Database

__all__ = ["optimize", "match_distance_order"]

# k must stay under the reference's vector-chunk unit for these rewrites
# (hnsw_optimize_topk.cpp:172, hnsw_optimize_join.cpp:458)
MAX_K = 2048


# --------------------------------------------------------- expression rule
def rewrite_expr(e: Expr) -> Expr:
    """(1.0 - array_cosine_similarity(a,b)) -> array_cosine_distance(a,b)."""
    if isinstance(e, BinOp):
        left = rewrite_expr(e.left)
        right = rewrite_expr(e.right)
        if (
            e.op == "-"
            and isinstance(left, Const)
            and np.ndim(left.value) == 0
            and float(np.asarray(left.value)) == 1.0
            and isinstance(right, Func)
            and right.name == "array_cosine_similarity"
        ):
            return Func("array_cosine_distance", right.args)
        return BinOp(e.op, left, right)
    if isinstance(e, Func):
        return Func(e.name, [rewrite_expr(a) for a in e.args])
    if isinstance(e, Not):
        return Not(rewrite_expr(e.child))
    return e


def _rewrite_plan_exprs(node: PlanNode) -> PlanNode:
    if isinstance(node, Filter):
        return Filter(_rewrite_plan_exprs(node.child), rewrite_expr(node.predicate))
    if isinstance(node, Projection):
        return Projection(
            _rewrite_plan_exprs(node.child),
            {k: rewrite_expr(v) for k, v in node.exprs.items()},
        )
    if isinstance(node, TopK):
        return TopK(
            _rewrite_plan_exprs(node.child),
            rewrite_expr(node.order),
            node.k,
            node.ascending,
        )
    if isinstance(node, MinByAgg):
        return MinByAgg(
            _rewrite_plan_exprs(node.child),
            rewrite_expr(node.value),
            rewrite_expr(node.order),
            node.k,
            node.output,
        )
    if isinstance(node, KNNJoin):
        return KNNJoin(
            _rewrite_plan_exprs(node.left),
            node.right_table,
            rewrite_expr(node.left_vector),
            node.right_column,
            node.k,
            node.metric_function,
        )
    return node


# --------------------------------------------------------- index matching
def match_distance_order(order: Expr):
    """Match `distance_fn(column, const_vector)` (either argument order),
    the analog of TryMatchDistanceFunction + TryBindIndexExpression
    (`hnsw_index.cpp:610-689`). Returns (function_name, column_name,
    query_vector) or None."""
    if not isinstance(order, Func):
        return None
    try:
        fdef = resolve_function(order.name)
    except ValueError:
        return None
    if fdef.index_metric is None or len(order.args) != 2:
        return None
    a, b = order.args
    if isinstance(a, ColumnRef) and isinstance(b, Const):
        col, q = a, b
    elif isinstance(b, ColumnRef) and isinstance(a, Const):
        col, q = b, a
    else:
        return None
    qv = np.asarray(q.value, np.float32)
    if qv.ndim != 1:
        return None
    return order.name, col.name, qv


def _find_index(db: Database, table: str, column: str, fn_name: str, dims: int):
    fdef = resolve_function(fn_name)
    for e in db.indexes_on(table, column):
        if (
            Metric.parse(e.index.config.metric) == fdef.index_metric
            and e.index.config.dims == dims
        ):
            return e
    return None


def _peel_filters(node: PlanNode):
    """Collect a Filter* chain down to a Scan. Returns (filters, scan) or
    None if the chain has any other shape."""
    filters = []
    while isinstance(node, Filter):
        filters.append(node.predicate)
        node = node.child
    if isinstance(node, Scan):
        return filters, node
    return None


# --------------------------------------------------------- plan rules
def _rewrite_topk(db: Database, node: TopK) -> Optional[PlanNode]:
    if not node.ascending or not (0 < node.k < MAX_K):
        return None
    m = match_distance_order(node.order)
    if m is None:
        return None
    fn_name, col, qv = m
    peeled = _peel_filters(node.child)
    if peeled is None:
        return None
    filters, scan = peeled
    t = db.table(scan.table)
    if col not in t.columns or not t.is_vector_column(col):
        return None
    if t.vector_dims(col) != qv.shape[0]:
        return None
    entry = _find_index(db, scan.table, col, fn_name, qv.shape[0])
    if entry is not None:
        if (
            filters
            and db.settings.get("hnsw_pushdown_filters")
            and getattr(entry.index, "supports_filter_pushdown", False)
        ):
            # push the conjunction into the scan (filtered_search); keep
            # the filters above as a cheap recheck
            pred = filters[0]
            for f in filters[1:]:
                from vss_tpu.query.ir import BinOp as _BinOp

                pred = _BinOp("and", pred, f)
            new: PlanNode = HNSWIndexScan(
                scan.table, entry.name, qv, node.k, pushed_filter=pred
            )
        else:
            new = HNSWIndexScan(scan.table, entry.name, qv, node.k)
    else:
        # exact MXU fallback — only safe with no filters below the TopN
        # (the brute-force operator applies k before filters would run)
        if filters:
            return None
        new = BruteForceTopK(scan.table, col, qv, node.k, fn_name)
    # filter pull-up: index scan produces k rows, filters apply after
    for pred in reversed(filters):
        new = Filter(new, pred)
    return new


def _rewrite_minby(db: Database, node: MinByAgg) -> Optional[PlanNode]:
    if not (0 < node.k < MAX_K):
        return None
    m = match_distance_order(node.order)
    if m is None:
        return None
    fn_name, col, qv = m
    peeled = _peel_filters(node.child)
    if peeled is None:
        return None
    filters, scan = peeled
    t = db.table(scan.table)
    if col not in t.columns or not t.is_vector_column(col):
        return None
    if t.vector_dims(col) != qv.shape[0]:
        return None
    entry = _find_index(db, scan.table, col, fn_name, qv.shape[0])
    if entry is None:
        return None
    child: PlanNode = HNSWIndexScan(scan.table, entry.name, qv, node.k)
    for pred in reversed(filters):
        child = Filter(child, pred)
    return MinByAgg(child, node.value, node.order, node.k, node.output)


def _rewrite_knn_join(db: Database, node: KNNJoin) -> Optional[PlanNode]:
    if not (0 < node.k < MAX_K):
        return None
    fdef = resolve_function(node.metric_function)
    if fdef.index_metric is None:
        return None
    t = db.table(node.right_table)
    if not t.is_vector_column(node.right_column):
        return None
    dims = t.vector_dims(node.right_column)
    entry = _find_index(db, node.right_table, node.right_column,
                        node.metric_function, dims)
    if entry is None:
        return None
    return HNSWIndexJoinNode(
        optimize(db, node.left), node.right_table, entry.name,
        node.left_vector, node.k,
    )


def optimize(db: Database, node: PlanNode) -> PlanNode:
    """Apply expression rewrites then plan rewrites, top-down."""
    node = _rewrite_plan_exprs(node)
    return _optimize_node(db, node)


def _optimize_node(db: Database, node: PlanNode) -> PlanNode:
    if isinstance(node, TopK):
        repl = _rewrite_topk(db, node)
        if repl is not None:
            return repl
        return TopK(_optimize_node(db, node.child), node.order, node.k, node.ascending)
    if isinstance(node, MinByAgg):
        repl = _rewrite_minby(db, node)
        if repl is not None:
            return repl
        return MinByAgg(
            _optimize_node(db, node.child), node.value, node.order, node.k, node.output
        )
    if isinstance(node, KNNJoin):
        repl = _rewrite_knn_join(db, node)
        if repl is not None:
            return repl
        return KNNJoin(
            _optimize_node(db, node.left),
            node.right_table,
            node.left_vector,
            node.right_column,
            node.k,
            node.metric_function,
        )
    if isinstance(node, Filter):
        return Filter(_optimize_node(db, node.child), node.predicate)
    if isinstance(node, Projection):
        return Projection(_optimize_node(db, node.child), node.exprs)
    if isinstance(node, HNSWIndexJoinNode):
        return HNSWIndexJoinNode(
            _optimize_node(db, node.left), node.table, node.index_name,
            node.left_vector, node.k,
        )
    from vss_tpu.query.ir import Limit, SimpleAggregate

    if isinstance(node, Limit):
        return Limit(_optimize_node(db, node.child), node.k)
    if isinstance(node, SimpleAggregate):
        return SimpleAggregate(_optimize_node(db, node.child), node.items)
    from vss_tpu.query.ir import GroupByAggregate

    if isinstance(node, GroupByAggregate):
        return GroupByAggregate(
            _optimize_node(db, node.child), node.keys, node.items
        )
    return node
