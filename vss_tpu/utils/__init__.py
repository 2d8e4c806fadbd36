"""Small shared utilities for vss_tpu."""
from vss_tpu.utils.shapes import cdiv, next_pow2, round_up, pad_dim, pad_to
from vss_tpu.utils.platform import on_tpu, use_pallas

__all__ = ["cdiv", "next_pow2", "round_up", "pad_dim", "pad_to", "on_tpu", "use_pallas"]
