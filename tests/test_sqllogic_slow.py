"""Mechanical execution of the reference's 2 `.test_slow` files
(`/root/reference/test/sql/slow/`), completing the 17/17 set
(tests/test_sqllogic_reference.py runs the 15 fast ones).

Scaled-down corpora, recorded here per file:

  * hnsw_reclaim_storage.test_slow — 1M rows -> 20k (and the probe row
    500000 -> 10000): the file's assertions are RELATIVE block-count
    comparisons across drop/recreate loops (reclaim within +4/+5 blocks),
    which scale freely; 1M x FLOAT[3] exists only to make blocks
    plural, and a 1M CPU build would take the whole suite's budget.
  * hnsw_lateral_join_group_large.test_slow — runs at full size (999
    queries x 999 items): every assertion is a label equivalence
    between the no-index and indexed runs plus one deterministic
    COUNT(*), so our PRNG not matching DuckDB's setseed stream is
    irrelevant.

Both run in the default suite (seconds at these sizes); the `slow`
marker lets `-m "not slow"` skip them.
"""
import os

import pytest

from vss_tpu.testing.sqllogic import run_sqllogic_file

SLOW_DIR = "/root/reference/test/sql/slow"

_CASES = {
    "hnsw_reclaim_storage.test_slow": {
        "range(1000000)": "range(20000)",
        "500000": "10000",
    },
    "hnsw_lateral_join_group_large.test_slow": None,
}

_FILES = sorted(os.listdir(SLOW_DIR)) if os.path.isdir(SLOW_DIR) else []


@pytest.mark.slow
@pytest.mark.skipif(not _FILES, reason="reference slow dir not present")
@pytest.mark.parametrize("fname", _FILES)
def test_reference_slow_file(fname, tmp_path):
    res = run_sqllogic_file(
        os.path.join(SLOW_DIR, fname),
        str(tmp_path),
        substitutions=_CASES.get(fname),
    )
    assert res.unmet_require is None, f"unmet require: {res.unmet_require}"
    fails = res.failures()
    assert not fails, "\n".join(
        f"line {r.line}: {r.sql[:120]} -> {r.detail[:300]}" for r in fails
    )
