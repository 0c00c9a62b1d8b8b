"""T5-style bucketed relative position bias (temporal attention).

Bucket function parity with vddp.py:83-100 (which mirrors T5): relative
position r = k_pos - q_pos, n = -r; half of the buckets encode sign, half the
magnitude with exact small-distance buckets and log-spaced large-distance
buckets capped at max_distance. The reference wires heads=8, num_buckets=32,
max_distance=32 (vddp.py:617, 70-80).
"""

from __future__ import annotations

import math

import numpy as np


def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Integer bucket ids for each relative position. Host-side (static wrt
    sequence length, so the bucket table is baked into the jitted graph)."""
    ret = np.zeros_like(relative_position)
    n = -relative_position

    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    # avoid log(0); the value is unused where is_small
    n_safe = np.maximum(n, 1)
    val_if_large = max_exact + (
        np.log(n_safe.astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)

    ret += np.where(is_small, n, val_if_large)
    return ret


def temporal_bucket_table(num_frames: int,
                          num_buckets: int = 32,
                          max_distance: int = 32) -> np.ndarray:
    """(num_frames, num_frames) bucket-id table for the temporal axis
    (vddp.py:102-108 builds this each forward; here it is a compile-time
    constant — the frame count is static under jit)."""
    q_pos = np.arange(num_frames, dtype=np.int64)
    k_pos = np.arange(num_frames, dtype=np.int64)
    rel_pos = k_pos[None, :] - q_pos[:, None]
    return relative_position_bucket(rel_pos, num_buckets=num_buckets,
                                    max_distance=max_distance)
