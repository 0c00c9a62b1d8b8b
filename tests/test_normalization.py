"""Normalization strategy parity vs the reference formulas
(src/normalization.py:5-96), oracled with torch ops."""

import numpy as np
import torch

from videometamaterials_tpu.data.normalization import (
    Normalization,
    one_hot_categoricals,
)


def _data(seed=0, shape=(20, 5)):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32) * 3


def test_global_min_max_2_roundtrip_and_range():
    d = _data()
    n = Normalization.fit(d, strategy="global-min-max-2")
    z = n.normalize(d)
    assert z.min() >= -1.0 - 1e-6 and z.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(n.unnormalize(z), d, rtol=1e-5, atol=1e-5)
    # exact formula (src/normalization.py:35-37)
    t = torch.tensor(d)
    want = 2.0 * (t - t.min()) / (t.max() - t.min()) - 1.0
    np.testing.assert_allclose(z, want.numpy(), rtol=1e-6)


def test_all_strategies_roundtrip():
    d = _data(1)
    for strat in ("min-max-1", "min-max-2", "global-min-max-1",
                  "global-min-max-2", "mean-std", "none"):
        n = Normalization.fit(d, strategy=strat)
        np.testing.assert_allclose(n.unnormalize(n.normalize(d)), d,
                                   rtol=1e-4, atol=1e-4)


def test_mean_std_uses_unbiased_std_like_torch():
    d = _data(2)
    n = Normalization.fit(d, strategy="mean-std")
    t = torch.tensor(d)
    np.testing.assert_allclose(n.std, t.std(dim=0).numpy(), rtol=1e-5)
    np.testing.assert_allclose(n.mu, t.mean(dim=0).numpy(), rtol=1e-5)


def test_fit_on_train_applies_to_val():
    """Validation set must reuse training-set scaling (vddp.py:1477-1478)."""
    train, val = _data(3), _data(4) + 10
    n = Normalization.fit(train, strategy="global-min-max-2")
    z = n.normalize(val)
    assert z.max() > 1.0  # out-of-range values stay out of range — no refit


def test_one_hot_categoricals():
    d = np.array([[0.5, 0], [0.7, 2], [0.1, 1]], dtype=np.float32)
    out = one_hot_categoricals(d, ["continuous", "categorical"])
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[:, 0], d[:, 0])
    np.testing.assert_array_equal(out[:, 1:],
                                  [[1, 0, 0], [0, 0, 1], [0, 1, 0]])


def test_serialization_roundtrip():
    d = _data(5)
    n = Normalization.fit(d, strategy="global-min-max-2")
    n2 = Normalization.from_dict(n.to_dict())
    np.testing.assert_allclose(n2.normalize(d), n.normalize(d))
