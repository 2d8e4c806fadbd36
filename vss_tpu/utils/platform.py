"""Platform detection: decide whether Pallas TPU kernels are usable.

Tests run on XLA:CPU (8 virtual devices); there we fall back to pure-XLA
implementations of every op. On real TPU the Pallas paths are used.
"""
from __future__ import annotations

import functools
import os

import jax


@functools.cache
def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.cache
def use_pallas() -> bool:
    """Whether to dispatch to Pallas TPU kernels.

    Overridable via VSS_TPU_FORCE_PALLAS=0/1 (tests force 0 on CPU).
    """
    env = os.environ.get("VSS_TPU_FORCE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return on_tpu()
