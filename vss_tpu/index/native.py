"""Native (C++) host-side graph construction.

Fast multithreaded CPU builder producing the same flat SoA arrays as the
TPU wave builder — the fresh-code counterpart of the reference's
CPU-parallel build path (`/root/reference/src/hnsw/
hnsw_index_physical_create.cpp` + usearch `add()`). Used for small/medium
tables and as a trusted quality baseline; falls back to the pure-NumPy
sequential builder when no C++ toolchain is present.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from vss_tpu.csrc import NativeUnavailable, load
from vss_tpu.index.graph import HNSWConfig, HNSWGraph, cast_to_tape, sample_levels

__all__ = ["native_available", "build_graph_native"]

_METRIC_IDS = {"l2sq": 0, "cosine": 1, "ip": 2}


def _lib():
    lib = load("hnsw_builder")
    fn = lib.vss_hnsw_build
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    return fn


def native_available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def build_graph_native(
    vectors,
    config: HNSWConfig,
    *,
    seed: int = 0,
    rowids: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    n_threads: int = 0,
) -> tuple[HNSWGraph, int]:
    """Build on host with the C++ builder; returns (graph, upper_used)."""
    import jax.numpy as jnp

    vectors = np.ascontiguousarray(np.asarray(vectors, np.float32))
    n, d = vectors.shape
    assert d == config.dims
    levels = np.ascontiguousarray(sample_levels(n, config, seed))
    cap = max(capacity or 0, n + 8)
    n_upper = int(levels.sum())
    upper_cap = max(64, n_upper + 1)

    adj0 = np.full((cap, config.m0), -1, np.int32)
    upper_adj = np.full((upper_cap, config.m), -1, np.int32)
    upper_row = np.full((cap, config.max_levels), -1, np.int32)
    entry = ctypes.c_int32(-1)
    max_level = ctypes.c_int32(-1)
    upper_used = ctypes.c_int64(0)

    fn = _lib()
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = fn(
        vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, d, config.m, config.m0, config.ef_construction,
        _METRIC_IDS[str(config.metric)],
        i32p(levels), config.max_levels,
        i32p(adj0), i32p(upper_adj), i32p(upper_row),
        ctypes.byref(entry), ctypes.byref(max_level), ctypes.byref(upper_used),
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native build failed (rc={rc})")

    if rowids is None:
        rowids = np.arange(n, dtype=np.int64)
    vec_tape = np.zeros((cap, d), np.float32)
    vec_tape[:n] = vectors
    lv = np.zeros(cap, np.int32)
    lv[:n] = levels
    valid = np.zeros(cap, bool)
    valid[:n] = True
    srow = np.full(cap, -1, np.int32)
    srow[:n] = np.asarray(rowids, np.int64).astype(np.int32)
    graph = HNSWGraph(
        vectors=cast_to_tape(jnp.asarray(vec_tape), config),
        adj0=jnp.asarray(adj0),
        upper_adj=jnp.asarray(upper_adj),
        upper_row=jnp.asarray(upper_row),
        levels=jnp.asarray(lv),
        valid=jnp.asarray(valid),
        slot_to_rowid=jnp.asarray(srow),
        entry=jnp.int32(entry.value),
        max_level=jnp.int32(max_level.value),
        count=jnp.int32(n),
    )
    return graph, int(upper_used.value)
