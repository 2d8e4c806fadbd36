"""Driver contract: bench.py emits one valid JSON line; __graft_entry__
exposes entry()/dryrun_multichip."""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        VSS_TPU_FORCE_PALLAS="0",
        VSS_BENCH_N="600",
        VSS_BENCH_NQ="50",
        VSS_BENCH_D="16",
        VSS_BENCH_DELETES="0.2",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the artifact is emitted incrementally (flagship first, re-emitted
    # enriched after every arm — round 3 lost its whole artifact to an
    # end-only print): EVERY stdout line must parse, the LAST one is the
    # record, and later lines only ever grow the earlier ones
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert lines, out.stdout
    parsed = [json.loads(l) for l in lines]
    rec = parsed[-1]
    for earlier in parsed[:-1]:
        assert set(earlier) <= set(rec)
    for key in ("metric", "value", "unit", "vs_baseline", "recall_at_k",
                "build_rows_per_s", "recall_after_compact"):
        assert key in rec, key
    assert rec["unit"] == "qps"
    assert rec["value"] > 0
    assert rec["recall_at_k"] > 0.8


def test_graft_entry_contract():
    import jax

    sys.path.insert(0, _REPO)
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    d, i = out
    assert d.shape == i.shape == (64, 10)
    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)


@pytest.mark.slow
def test_bench_flagship_resume(tmp_path):
    """A relaunched child whose resume file holds a COMPLETE flagship
    block must skip straight past it (round 4 lost the driver artifact
    to a flagship replay after a mid-arm wedge) and reprint an identical
    artifact."""
    ef = str(tmp_path / "resume.json")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        VSS_TPU_FORCE_PALLAS="0",
        VSS_BENCH_N="400",
        VSS_BENCH_NQ="32",
        VSS_BENCH_D="8",
        VSS_BENCH_DELETES="0",
        VSS_BENCH_SUPERVISE="0",
        VSS_BENCH_EMIT_FILE=ef,
    )
    runs = []
    for _ in range(2):
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py")],
            capture_output=True, text=True, timeout=300, env=env, cwd=_REPO,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        runs.append(out)
    first = json.loads(runs[0].stdout.strip().splitlines()[-1])
    second = json.loads(runs[1].stdout.strip().splitlines()[-1])
    assert "resumed complete flagship block" in runs[1].stderr
    assert second == first
    assert "_phases" not in second  # cache keys never leak to stdout


def test_bench_resume_file_roundtrip(tmp_path, monkeypatch):
    """emit() mirrors the artifact to the supervisor's resume file and
    _load_resume() reads it back — the mechanism that lets a relaunched
    bench child inherit finished arm blocks instead of superseding a
    richer earlier stdout line with a flagship-only one."""
    sys.path.insert(0, _REPO)
    import importlib

    import bench

    ef = str(tmp_path / "resume.json")
    monkeypatch.setenv("VSS_BENCH_EMIT_FILE", ef)
    obj = {"metric": "m", "value": 1.0, "iid": {"graph_recall": 0.92}}
    bench.emit(obj)
    assert os.path.exists(ef)
    back = bench._load_resume()
    assert back == obj
    # corrupt file -> empty resume, never an exception
    with open(ef, "w") as f:
        f.write("{not json")
    assert bench._load_resume() == {}
    monkeypatch.delenv("VSS_BENCH_EMIT_FILE")
    assert bench._load_resume() == {}
    del importlib
