"""NRMSE / best-of-N error metrics parity (src/utils.py:94-156)."""

import numpy as np

from videometamaterials_tpu.postproc.metrics import (
    compute_NRMSE,
    compute_NRMSE_arrays,
    compute_full_error,
    find_closest_match,
)


def test_nrmse_basic():
    y = np.array([1.0, 2.0, 3.0])
    assert compute_NRMSE(y, y) == 0.0
    got = compute_NRMSE(y, y + 1)
    want = np.sqrt(3 / np.sum(y ** 2))
    np.testing.assert_allclose(got, want)


def test_nrmse_arrays_and_closest_match():
    y = np.array([1.0, 1.0])
    preds = np.array([[1.0, 1.0], [2.0, 2.0], [1.1, 1.0]])
    arr = compute_NRMSE_arrays(y, preds)
    assert arr[0] == 0.0
    e, idx = find_closest_match(y, preds)
    assert idx == 0 and e == 0.0
    e2, idx2 = find_closest_match(y, preds, skip_first=True)
    assert idx2 == 2


def test_compute_full_error_best_of_n_and_divergence_cut():
    # 2 targets x (1 target row + 2 predictions)
    target1 = np.array([1.0, 2.0, 3.0])
    good = target1 + 0.1
    diverged = np.array([1.0, 100.0, 3.0])   # cut after first entry
    target2 = np.array([2.0, 2.0, 2.0])
    perfect = target2.copy()
    data = np.stack([target1, good, diverged, target2, perfect, perfect + 1])
    mean_err, mean_min_err, idx = compute_full_error(data, samples=2)
    assert mean_min_err < mean_err
    # best prediction for target2 is the perfect one (index 0 of its preds)
    assert idx[1] == 0
    # diverged prediction: NRMSE computed on 1-entry prefix
    prefix_err = compute_NRMSE(target1[:1], diverged[:1])
    np.testing.assert_allclose(prefix_err, 0.0)


def test_compute_full_error_closest_match_baseline():
    target = np.array([1.0, 2.0])
    pred = np.array([1.5, 2.5])
    data = np.stack([target, pred])
    full = np.stack([target * 2, target * 0.9])
    out = compute_full_error(data, samples=1, closest_match=True,
                             full_data=full)
    assert len(out) == 5
    _, _, _, err_match, best_rel = out
    assert err_match[0] > 0
