"""True multi-process distributed test: two OS processes, each with 2
virtual CPU devices, joined through jax.distributed into one 4-device
global mesh. Build + broadcast search + collective merge run as real
multi-controller SPMD — the deployment shape of SURVEY §5.8, which the
single-process 8-device mesh tests cannot exercise (cross-process
placement via make_array_from_process_local_data, collective transport,
replicated outputs)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["VSS_REPO"])
import numpy as np
import jax

from vss_tpu.parallel import multihost
mesh = multihost.initialize()  # env-driven: VSS_COORDINATOR/_NUM/_ID

from vss_tpu.index import HNSWConfig
from vss_tpu.parallel.sharded import ShardedHNSWIndex

rng = np.random.default_rng(0)  # same data on every process (SPMD)
vecs = rng.standard_normal((256, 8)).astype(np.float32)
cfg = HNSWConfig(dims=8, m=8, ef_construction=48)
# the exact MXU path now runs on multi-process meshes too (round-4):
# each process repairs its addressable shards, then the global stacked
# graph reassembles from process-local data
idx = ShardedHNSWIndex.build(vecs, cfg, mesh, method="exact")
d, rows = idx.search(vecs[:8], k=3)
widx = ShardedHNSWIndex.build(vecs, cfg, mesh, wave_size=64, method="wave")
_, wrows = widx.search(vecs[:8], k=3)
out = {
    "process": jax.process_index(),
    "n_devices": len(jax.devices()),
    "n_local": len(jax.local_devices()),
    "rows": np.asarray(rows).tolist(),
    "self_hit": int((np.asarray(rows)[:, 0] == np.arange(8)).sum()),
    "wave_self_hit": int((np.asarray(wrows)[:, 0] == np.arange(8)).sum()),
}
print("RESULT " + json.dumps(out), flush=True)
"""


def test_two_process_distributed_build_and_search(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU backend
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            VSS_REPO=_REPO,
            VSS_COORDINATOR=f"127.0.0.1:{port}",
            VSS_NUM_PROCESSES="2",
            VSS_PROCESS_ID=str(pid),
            VSS_TPU_FORCE_PALLAS="0",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["process"]] = r
    assert set(results) == {0, 1}
    for r in results.values():
        assert r["n_devices"] == 4 and r["n_local"] == 2
        # searching for indexed vectors finds them (merged across processes)
        assert r["self_hit"] >= 7
        # the exact path matches the wave path's quality bar
        assert r["self_hit"] >= r["wave_self_hit"] - 1
    # replicated outputs agree bit-for-bit across processes
    assert results[0]["rows"] == results[1]["rows"]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
