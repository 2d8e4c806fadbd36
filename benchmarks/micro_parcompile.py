"""Where does the per-process first-call tax live on the axon backend?

In one process, for the real 1M-build programs:
  a) AOT .lower().compile() the assign program   (timed)
  b) first real CALL of assign                    (timed — if still slow,
     the tax is at first execution, not compile)
  c) first real CALL of score_groups, no AOT      (timed — baseline)
  d) dummy-CALL warmup of knn_all on a thread while the main thread
     dummy-calls score again with other knobs     (timed — do concurrent
     first-calls overlap?)
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_claimed = threading.Event()


def _watchdog():
    if not _claimed.wait(150):
        print("[parc] claim wedged; exit 42", file=sys.stderr, flush=True)
        os._exit(42)


threading.Thread(target=_watchdog, daemon=True).start()
_ = jax.devices()
_claimed.set()
_x = jnp.ones((256, 256))
_ = float((_x @ _x).sum())
print("[parc] first op ok", file=sys.stderr, flush=True)

from vss_tpu.index.ivf_candidates import _assign_pass, _score_groups

S = jax.ShapeDtypeStruct
W, window, probes, d = 3912, 256, 16, 128

# a) AOT compile assign
t0 = time.perf_counter()
_assign_pass.lower(
    S((1003520, d), np.float32), S((3907, d), np.float32), chunk=4096
).compile()
print(f"[parc] a) AOT assign: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)

# b) first real call of assign
x = jnp.ones((1003520, d), jnp.float32)
c = jnp.ones((3907, d), jnp.float32)
t0 = time.perf_counter()
jax.block_until_ready(_assign_pass(x, c, 4096))
print(f"[parc] b) first assign call: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)

# c) first call of score_groups, no AOT
wt = jnp.ones((W, window, d), jnp.float32)
gi = jnp.ones((W, window), jnp.int32)
nb = jnp.zeros((W, probes), jnp.int32)
t0 = time.perf_counter()
jax.block_until_ready(
    _score_groups(wt, gi, nb, 64, "l2sq", 8, window, probes, True)
)
print(f"[parc] c) first score call: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)

# d) two concurrent first-calls (distinct knobs)
def call_score(cc):
    jax.block_until_ready(
        _score_groups(wt, gi, nb, cc, "l2sq", 8, window, probes, True)
    )

t0 = time.perf_counter()
ts = [threading.Thread(target=call_score, args=(56,)),
      threading.Thread(target=call_score, args=(48,))]
for t in ts:
    t.start()
for t in ts:
    t.join()
print(f"[parc] d) two concurrent first-calls: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)
print("[parc] done", file=sys.stderr, flush=True)
