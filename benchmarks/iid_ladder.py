"""iid deep-dive (round 4): how far can the GRAPH path get on flat data?

The round-3 isolation (benchmarks/iid_isolate.py) showed the collapse is
NOT candidate quality alone: even exact top-C candidate lists produce a
graph whose beam search reaches only ~0.62 recall@10 at ef=128 on
200k x 128 iid Gaussian (ivf 0.27, wave 0.55, f32 == int8). This script
maps the attainable frontier: ef ladders over (a) the exact-candidate
graph at the default degree, (b) higher-degree graphs (m=24, m=32), and
(c) the ivf+NN-descent graph — the production bulk path.

Run on the real chip:  python benchmarks/iid_ladder.py
Env: N (default 100k), WHICH=exact16,exact24,exact32,nnd
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 100_000))
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
        print("[ladder] device claim wedged; exit 42", file=sys.stderr, flush=True)
        os._exit(42)


threading.Thread(target=_watchdog, daemon=True).start()
_ = jax.devices()
_claimed.set()

# mid-run wedge watchdog: the tunnel can stall AFTER a clean claim (the
# first GT op once sat >45 min with ~0 CPU). Exit 42 lets a retry loop
# re-exec a fresh process (backend registration is per-process).
_beat = [__import__("time").time()]


def _heartbeat():
    import time as _t
    while True:
        _t.sleep(30)
        if _t.time() - _beat[0] > 900:
            print("[ladder] no progress for 900s; exit 42",
                  file=sys.stderr, flush=True)
            os._exit(42)


threading.Thread(target=_heartbeat, daemon=True).start()


def _tick(msg):
    _beat[0] = __import__("time").time()
    print(msg, file=sys.stderr, flush=True)

import jax.numpy as jnp

from vss_tpu.index import HNSWConfig
from vss_tpu.index.dense import HNSWIndex
from vss_tpu.ops import bruteforce_topk

rng = np.random.default_rng(7)
vecs = rng.standard_normal((N, D)).astype(np.float32) * 50.0
queries = rng.standard_normal((NQ, D)).astype(np.float32) * 50.0

print(f"[ladder] N={N} D={D} ground truth...", file=sys.stderr, flush=True)
gt = np.asarray(bruteforce_topk(jnp.asarray(queries), jnp.asarray(vecs), K, "l2sq")[1])


def recall(idx, ef):
    _, rows = idx.search(queries, k=K, ef=ef)
    rows = np.asarray(rows)
    hits = sum(
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(rows, gt)
    )
    return hits / (NQ * K)


def run(tag, cand_mode, m, nnd, efs=(64, 128, 256, 512)):
    import time as _t

    os.environ["VSS_CAND_MODE"] = cand_mode
    os.environ["VSS_NND"] = "1" if nnd else "0"
    cfg = HNSWConfig(dims=D, metric="l2sq", m=m, ef_search=64,
                     storage_dtype="int8")
    t0 = time.perf_counter()
    idx = HNSWIndex.build(
        vecs, cfg, method="exact",
        progress=lambda a, b: _beat.__setitem__(0, _t.time()),
    )
    _ = float(np.asarray(idx.graph.count))
    bs = time.perf_counter() - t0
    line = f"[ladder] {tag:10s} m={m:2d} build={bs:6.1f}s "
    for ef in efs:
        line += f" ef{ef}={recall(idx, ef):.4f}"
        _beat[0] = _t.time()
        print(line, file=sys.stderr, flush=True)
    del idx
    jax.clear_caches()


which = os.environ.get("WHICH", "exact16,exact24,exact32,nnd").split(",")
if "exact16" in which:
    run("exact", "exact", 16, False)
if "exact24" in which:
    run("exact", "exact", 24, False)
if "exact32" in which:
    run("exact", "exact", 32, False)
if "nnd" in which:
    run("ivf+nnd", "ivf", 16, True)
if "nnd32" in which:
    run("ivf+nnd", "ivf", 32, True)
if "scan16" in which:
    run("scan", "scan", 16, False)
if "scan32" in which:
    run("scan", "scan", 32, False)
if "scan48" in which:
    run("scan", "scan", 48, False, efs=(256, 512, 768))
print("[ladder] done", file=sys.stderr, flush=True)
