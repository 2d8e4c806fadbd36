"""Test harness configuration.

Tests run on XLA:CPU with 8 virtual devices so that multi-chip sharding
(`jax.sharding.Mesh`) is exercised without TPU hardware. The container's
sitecustomize registers the TPU backend at interpreter start, before this
file runs — so we reset JAX to the CPU platform in-process here.

Set VSS_TPU_TEST_ON_TPU=1 to keep the TPU backend and run tests on chip.
"""
import os
import sys

# Make the repo root importable no matter where pytest is invoked from.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

if os.environ.get("VSS_TPU_TEST_ON_TPU") != "1":
    os.environ["VSS_TPU_FORCE_PALLAS"] = "0"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
    assert jax.default_backend() == "cpu", "tests must run on XLA:CPU"
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_per_module():
    """Cap compiled-program/workspace accumulation: the full suite holds
    hundreds of XLA executables by its last third, and the host compiler
    was observed SIGABRTing there (while every module passes in
    isolation). Dropping caches at module boundaries keeps the process
    footprint flat at the cost of a few re-compiles."""
    yield
    import jax

    jax.clear_caches()
