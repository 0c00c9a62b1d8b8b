"""T5 relative-position bucket parity with the reference's torch
implementation (vddp.py:83-100), re-derived here in torch as the oracle."""

import numpy as np
import torch

from videometamaterials_tpu.ops.relative_bias import (
    relative_position_bucket,
    temporal_bucket_table,
)


def _torch_bucket(relative_position, num_buckets=32, max_distance=128):
    import math
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).long() * num_buckets
    n = torch.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        torch.log(n.float() / max_exact) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).long()
    val_if_large = torch.min(val_if_large,
                             torch.full_like(val_if_large, num_buckets - 1))
    ret += torch.where(is_small, n, val_if_large)
    return ret


def test_bucket_matches_torch_oracle():
    for num_buckets, max_distance in ((32, 32), (32, 128), (16, 64)):
        rel = np.arange(-60, 61).reshape(11, 11)
        got = relative_position_bucket(rel, num_buckets, max_distance)
        want = _torch_bucket(torch.tensor(rel), num_buckets,
                             max_distance).numpy()
        np.testing.assert_array_equal(got, want)


def test_temporal_table_reference_config():
    # heads=8, num_buckets=32, max_distance=32 (vddp.py:617)
    table = temporal_bucket_table(11, num_buckets=32, max_distance=32)
    assert table.shape == (11, 11)
    assert (np.diag(table) == 0).all()          # zero distance -> bucket 0
    assert table[0, 1] != table[1, 0]           # sign asymmetry
    assert table.max() < 32
