"""Compute kernels: distance tiles and top-k primitives."""
from vss_tpu.ops.distance import (
    Metric,
    dispatch_pairwise,
    distance_one,
    gathered_distances,
    pairwise,
    pairwise_pallas,
)
from vss_tpu.ops.topk import bruteforce_topk, merge_topk

__all__ = [
    "Metric",
    "pairwise",
    "pairwise_pallas",
    "dispatch_pairwise",
    "distance_one",
    "gathered_distances",
    "bruteforce_topk",
    "merge_topk",
]
