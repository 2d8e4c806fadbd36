"""Index checkpoint serialization.

The TPU-native analog of the reference's stream format
(`/root/reference/src/include/usearch/index_dense.hpp:811-980` — a fixed
head struct followed by raw node tapes). Here a checkpoint is:

    magic "VSSTPU01"  (8 bytes)
    u64 header_len    (little-endian)
    header JSON       (config, counters, free ring, array table)
    raw array bytes   (in array-table order, C-contiguous)

Arrays are trimmed to their used extents (next_slot / upper_used) so the
file size tracks live data, not capacity; load re-pads to a fresh
capacity. Works against any file-like object so the same format flows
through plain files or the block store (`vss_tpu.storage.blockfile`).
"""
from __future__ import annotations

import dataclasses
import io
import json
import struct
from typing import BinaryIO

import jax.numpy as jnp
import numpy as np

from vss_tpu.index.dense import HNSWIndex, _RESERVE
from vss_tpu.index.graph import HNSWConfig, HNSWGraph, empty_graph
from vss_tpu.utils import round_up

__all__ = ["serialize_index", "deserialize_index", "save_index", "load_index"]

MAGIC = b"VSSTPU01"


def serialize_index(idx: HNSWIndex, stream: BinaryIO) -> None:
    g = idx.graph
    n = idx.next_slot
    u = idx.upper_used
    arrays = {
        "vectors": np.asarray(g.vectors)[:n],
        "adj0": np.asarray(g.adj0)[:n],
        "upper_adj": np.asarray(g.upper_adj)[:u],
        "upper_row": np.asarray(g.upper_row)[:n],
        "levels": np.asarray(g.levels)[:n],
        "valid": np.asarray(g.valid)[:n],
        "slot_to_rowid": np.asarray(g.slot_to_rowid)[:n],
        "free_slots": np.asarray(idx.free_slots, np.int32),
    }
    if idx.rerank_tape is not None:
        arrays["rerank"] = np.asarray(idx.rerank_tape)[:n]
    table = [
        {"name": k, "dtype": str(v.dtype), "shape": list(v.shape)}
        for k, v in arrays.items()
    ]
    header = {
        "version": 1,
        "config": dataclasses.asdict(idx.config),
        "next_slot": n,
        "upper_used": u,
        "entry": int(g.entry),
        "max_level": int(g.max_level),
        "count": int(g.count),
        "deleted_count": idx.deleted_count,
        "vector_scale": idx.vector_scale,
        "scale_max_abs": idx.scale_max_abs,
        "scale_overflow": idx.scale_overflow,
        "arrays": table,
    }
    hbytes = json.dumps(header).encode()
    stream.write(MAGIC)
    stream.write(struct.pack("<Q", len(hbytes)))
    stream.write(hbytes)
    for v in arrays.values():
        stream.write(np.ascontiguousarray(v).tobytes())


def deserialize_index(stream: BinaryIO) -> HNSWIndex:
    magic = stream.read(8)
    if magic != MAGIC:
        raise ValueError(f"bad checkpoint magic {magic!r}")
    (hlen,) = struct.unpack("<Q", stream.read(8))
    header = json.loads(stream.read(hlen).decode())
    if header["version"] != 1:
        raise ValueError(f"unsupported checkpoint version {header['version']}")
    config = HNSWConfig(**header["config"])
    arrays = {}
    for spec in header["arrays"]:
        if spec["dtype"] == "bfloat16":
            import ml_dtypes

            dt = np.dtype(ml_dtypes.bfloat16)
        else:
            dt = np.dtype(spec["dtype"])
        shape = tuple(spec["shape"])
        nbytes = dt.itemsize * int(np.prod(shape)) if shape else dt.itemsize
        buf = stream.read(nbytes)
        if len(buf) != nbytes:
            raise ValueError("truncated checkpoint")
        arrays[spec["name"]] = np.frombuffer(buf, dt).reshape(shape).copy()

    n = header["next_slot"]
    u = header["upper_used"]
    cap = max(64, round_up(n + _RESERVE, 64))
    upper_cap = max(64, u + 64 + 1)
    idx = HNSWIndex(config, capacity=cap)
    g = empty_graph(config, cap, upper_cap)

    def place(base, data, fill):
        if data.shape[0] == 0:
            return base
        return base.at[: data.shape[0]].set(jnp.asarray(data))

    idx.graph = HNSWGraph(
        # dtype guard: checkpoints written by versions whose compact()
        # promoted the tape keep loading (values are in-range by
        # construction); the scatter itself must be dtype-matched
        vectors=place(
            g.vectors,
            arrays["vectors"].astype(np.dtype(g.vectors.dtype), copy=False),
            0.0,
        ),
        adj0=place(g.adj0, arrays["adj0"], -1),
        upper_adj=place(g.upper_adj, arrays["upper_adj"], -1),
        upper_row=place(g.upper_row, arrays["upper_row"], -1),
        levels=place(g.levels, arrays["levels"], 0),
        valid=place(g.valid, arrays["valid"], False),
        slot_to_rowid=place(g.slot_to_rowid, arrays["slot_to_rowid"], -1),
        entry=jnp.int32(header["entry"]),
        max_level=jnp.int32(header["max_level"]),
        count=jnp.int32(header["count"]),
    )
    idx.next_slot = n
    idx.upper_used = u
    if "rerank" in arrays:
        rr = arrays["rerank"]
        tape = jnp.zeros((cap, config.dims), rr.dtype)
        idx.rerank_tape = place(tape, rr, 0.0)
    else:
        # checkpoint written without a side tape (older format or rerank
        # disabled at save time): don't rescore against zeros
        idx.rerank_tape = None
    idx.free_slots = [int(s) for s in arrays["free_slots"]]
    idx.deleted_count = header["deleted_count"]
    idx.vector_scale = float(header.get("vector_scale", 1.0))
    idx.scale_max_abs = float(
        header.get("scale_max_abs", idx.vector_scale * 127.0)
    )
    idx.scale_overflow = int(header.get("scale_overflow", 0))
    valid = arrays["valid"]
    rowids = arrays["slot_to_rowid"]
    idx.rowid_to_slot = {
        int(rowids[s]): int(s) for s in np.flatnonzero(valid)
    }
    idx._insert_seed = n
    idx.dirty = False
    return idx


def save_index(idx: HNSWIndex, path: str) -> None:
    with open(path, "wb") as f:
        serialize_index(idx, f)
    idx.dirty = False


def load_index(path: str, view: bool = False) -> HNSWIndex:
    if view:
        return view_index(path)
    with open(path, "rb") as f:
        return deserialize_index(f)


def view_index(path: str) -> HNSWIndex:
    """Zero-copy host load: graph arrays are memory-mapped straight out of
    the checkpoint file — the analog of usearch's `view()`
    (`/root/reference/src/include/usearch/index.hpp:3276-3310`). No array
    bytes are read (or uploaded) until an operation touches them; the OS
    pages them in on demand. The view has no insert headroom — the first
    DML grows (and thereby copies) the graph, exactly the copy-on-write
    contract a mmap view implies."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"bad checkpoint magic {magic!r}")
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode())
        base = 16 + hlen
    if header["version"] != 1:
        raise ValueError(f"unsupported checkpoint version {header['version']}")
    config = HNSWConfig(**header["config"])
    arrays = {}
    off = base
    for spec in header["arrays"]:
        if spec["dtype"] == "bfloat16":
            import ml_dtypes

            dt = np.dtype(ml_dtypes.bfloat16)
        else:
            dt = np.dtype(spec["dtype"])
        shape = tuple(spec["shape"])
        count = int(np.prod(shape)) if shape else 1
        if count == 0:
            arrays[spec["name"]] = np.zeros(shape, dt)
        else:
            arrays[spec["name"]] = np.memmap(
                path, dtype=dt, mode="r", offset=off, shape=shape
            )
        off += dt.itemsize * count

    n = header["next_slot"]
    u = header["upper_used"]
    idx = HNSWIndex(config, capacity=64)
    # the memmaps ARE the graph arrays (JAX uploads each lazily on first
    # use); capacity == stored extent, no reserve slack
    idx.graph = HNSWGraph(
        vectors=arrays["vectors"],
        adj0=arrays["adj0"],
        upper_adj=arrays["upper_adj"],
        upper_row=arrays["upper_row"],
        levels=arrays["levels"],
        valid=arrays["valid"],
        slot_to_rowid=arrays["slot_to_rowid"],
        entry=jnp.int32(header["entry"]),
        max_level=jnp.int32(header["max_level"]),
        count=jnp.int32(header["count"]),
    )
    idx.next_slot = n
    idx.upper_used = u
    idx.rerank_tape = arrays.get("rerank")
    idx.free_slots = [int(s) for s in np.asarray(arrays["free_slots"])]
    idx.deleted_count = header["deleted_count"]
    idx.vector_scale = float(header.get("vector_scale", 1.0))
    idx.scale_max_abs = float(
        header.get("scale_max_abs", idx.vector_scale * 127.0)
    )
    idx.scale_overflow = int(header.get("scale_overflow", 0))
    valid = np.asarray(arrays["valid"])
    rowids = np.asarray(arrays["slot_to_rowid"])
    idx.rowid_to_slot = {
        int(rowids[s]): int(s) for s in np.flatnonzero(valid)
    }
    idx._insert_seed = n
    idx.dirty = False
    return idx
