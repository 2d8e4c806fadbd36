"""Isolate the iid-recall collapse (VERDICT r3 task #1).

Builds 200k x 128 iid-Gaussian indexes four ways and prints a recall
table, separating candidate-generation quality from everything
downstream (refine/backlinks/search/quantization):

  exact-int8 : n^2 exact candidates, int8 storage   (downstream check)
  ivf-int8   : IVF-window candidates, int8 storage  (the flagship path)
  ivf-f32    : IVF-window candidates, f32 storage   (quantization check)
  wave-int8  : incremental wave builder             (distribution-agnostic)

Run on the real chip:  python benchmarks/iid_isolate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 200_000))
D = int(os.environ.get("D", 128))
NQ = 512
K = 10

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import threading

_claimed = threading.Event()


def _watchdog():
    if not _claimed.wait(150):
        print("[isolate] device claim wedged; exit 42", file=sys.stderr, flush=True)
        os._exit(42)


threading.Thread(target=_watchdog, daemon=True).start()
_ = jax.devices()
_claimed.set()

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex
from vss_tpu.ops import bruteforce_topk

rng = np.random.default_rng(7)
vecs = rng.standard_normal((N, D)).astype(np.float32) * 50.0
queries = rng.standard_normal((NQ, D)).astype(np.float32) * 50.0

print(f"[isolate] N={N} D={D} ground truth...", file=sys.stderr, flush=True)
gt = np.asarray(bruteforce_topk(jnp.asarray(queries), jnp.asarray(vecs), K, "l2sq")[1])


def recall(idx, ef):
    _, rows = idx.search(queries, k=K, ef=ef)
    rows = np.asarray(rows)
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(rows, gt)
    )
    return hits / (NQ * K)


def run(tag, method, cand_mode, storage):
    os.environ["VSS_CAND_MODE"] = cand_mode
    cfg = HNSWConfig(dims=D, metric="l2sq", ef_search=64, storage_dtype=storage)
    t0 = time.perf_counter()
    idx = HNSWIndex.build(vecs, cfg, method=method)
    _ = float(np.asarray(idx.graph.count))
    bs = time.perf_counter() - t0
    r64 = recall(idx, 64)
    r128 = recall(idx, 128)
    print(
        f"[isolate] {tag:12s} build={bs:6.1f}s recall@10 ef=64: {r64:.4f}"
        f"  ef=128: {r128:.4f}",
        file=sys.stderr, flush=True,
    )
    del idx
    jax.clear_caches()
    return r64, r128


which = os.environ.get("WHICH", "exact,ivf,ivf32,wave").split(",")
if "exact" in which:
    run("exact-int8", "exact", "exact", "int8")
if "ivf" in which:
    run("ivf-int8", "exact", "ivf", "int8")
if "ivf32" in which:
    run("ivf-f32", "exact", "ivf", "f32")
if "wave" in which:
    run("wave-int8", "wave", "ivf", "int8")
print("[isolate] done", file=sys.stderr, flush=True)
