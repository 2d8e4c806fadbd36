"""Microbench of the IVF candidate pass at bench scale on the real chip.

Two in-process repetitions: rep 1 pays compiles, rep 2 is steady state.
Phase marks come from VSS_EXACT_DEBUG=1 inside ivf_candidates.
"""
import os
import sys
import threading
import time

os.environ.setdefault("VSS_EXACT_DEBUG", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 1_000_000))
D = int(os.environ.get("D", 128))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_claimed = threading.Event()


def _watchdog():
    if not _claimed.wait(150):
        print("[micro_ivf] claim wedged; exit 42", file=sys.stderr, flush=True)
        os._exit(42)


threading.Thread(target=_watchdog, daemon=True).start()
_ = jax.devices()
_claimed.set()

import jax.numpy as jnp
import numpy as np

_x = jnp.ones((256, 256))
_ = float((_x @ _x).sum())
print("[micro_ivf] first op ok", file=sys.stderr, flush=True)

from vss_tpu.index.ivf_candidates import ivf_candidates

rng = np.random.default_rng(0)
n_centers = max(64, N // 2000)
centers = rng.uniform(0, 255, (n_centers, D))
vecs = np.clip(
    centers[rng.integers(0, n_centers, N)] + rng.normal(0, 25, (N, D)), 0, 255
).astype(np.float32)
xv = jnp.asarray(vecs)
ids = jnp.arange(N, dtype=jnp.int32)

for rep in range(2):
    t0 = time.perf_counter()
    cd, ci = ivf_candidates(xv, ids, 64, "l2sq", seed=1)
    jax.block_until_ready(ci)
    dt = time.perf_counter() - t0
    print(f"[micro_ivf] rep{rep}: {dt:.2f}s", file=sys.stderr, flush=True)
print("[micro_ivf] done", file=sys.stderr, flush=True)
