"""Shape/padding helpers used across kernels.

Everything under jit needs static shapes; these helpers pad host-side
arrays (or device arrays outside kernels) up to tile boundaries.
"""
from __future__ import annotations

import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_dim(x, axis: int, target: int, value=0):
    """Pad array `x` along `axis` up to `target` with `value` (no-op if already there)."""
    cur = x.shape[axis]
    if cur == target:
        return x
    if cur > target:
        raise ValueError(f"cannot pad axis {axis} from {cur} down to {target}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - cur)
    return jnp.pad(x, widths, constant_values=value)


def pad_to(x, axis: int, multiple: int, value=0):
    """Pad along `axis` to the next multiple of `multiple`."""
    return pad_dim(x, axis, round_up(x.shape[axis], multiple), value)


def next_pow2(x: int, cap: int | None = None) -> int:
    """Smallest power of two >= x (>=1); optionally clamped to `cap`.

    Used to bucket dynamic batch/wave sizes so jit recompilation count
    stays logarithmic in the sizes seen."""
    p = 1
    while p < x:
        p *= 2
    return min(p, cap) if cap is not None else p
