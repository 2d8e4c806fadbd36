"""Native (C++) components: lazy g++ build + ctypes loading.

The reference ships its runtime as C++ (usearch + the DuckDB block
bridge); vss_tpu's equivalents live here: the host-side HNSW builder and
the linked-block store. Shared objects are compiled on first use with g++
and cached next to the sources; every native feature has a pure-Python
fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


class NativeUnavailable(RuntimeError):
    pass


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", so, src,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        raise NativeUnavailable(f"cannot run g++: {e}") from e
    if proc.returncode != 0:
        raise NativeUnavailable(
            f"g++ failed for {name}: {proc.stderr[-2000:]}"
        )
    return so


def load(name: str) -> ctypes.CDLL:
    """Load (building if needed) lib<name>.so from csrc."""
    with _LOCK:
        if name not in _CACHE:
            _CACHE[name] = ctypes.CDLL(_build(name))
        return _CACHE[name]


def available(name: str) -> bool:
    try:
        load(name)
        return True
    except NativeUnavailable:
        return False
