"""Dataset contract tests on a synthetic GIF dataset (layout + renorm recipe
parity with vddp.py:1126-1397)."""

import numpy as np
import pytest

from videometamaterials_tpu.data.dataset import VideoDataset, interpolate_labels
from videometamaterials_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    folder = tmp_path_factory.mktemp("data") / "train"
    make_synthetic_dataset(folder, num_samples=4, image_size=24, num_frames=5)
    return folder


def _ds(folder, **kw):
    defaults = dict(image_size=24, selected_channels=[0, 1, 3], num_frames=5,
                    per_frame_cond=True, reference_frame="lagrangian")
    defaults.update(kw)
    return VideoDataset(folder, **defaults)


def test_shapes_and_ranges(synth):
    ds = _ds(synth)
    assert len(ds) == 4
    v, l = ds[0]
    assert v.shape == (5, 24, 24, 3)
    assert l.shape == (5,)
    assert v.min() >= -1e-6 and v.max() <= 1.0 + 1e-6
    # labels normalized to [-1, 1] via global-min-max-2
    assert ds.labels.min() >= -1.0 - 1e-6 and ds.labels.max() <= 1.0 + 1e-6


def test_min_max_values_csv_written(synth):
    _ds(synth)
    lines = (synth / "min_max_values.csv").read_text().strip().splitlines()
    keys = [l.split(",")[0] for l in lines]
    assert keys == ["min_u_1", "max_u_1", "min_u_2", "max_u_2",
                    "max_s_mises", "min_s_22", "max_s_22",
                    "max_strain_energy"]


def test_void_pixels_are_field_zero(synth):
    """After the unnorm->mask->renorm recipe, void pixels must sit exactly at
    the normalized physical-zero value of each channel."""
    ds = _ds(synth, selected_channels=[0, 1, 2, 3])
    v, _ = ds[1]
    from videometamaterials_tpu.data.gif_io import gif_to_array
    topo = gif_to_array(synth / "gifs" / "topo" / "1.gif", 24,
                        expected_frames=5).astype(np.float32) / 255.0
    void = topo == 0
    zero_u1 = (0 - ds.min_u_1) / (ds.max_u_1 - ds.min_u_1)
    zero_u2 = (0 - ds.min_u_2) / (ds.max_u_2 - ds.min_u_2)
    zero_s22 = (0 - ds.min_s_22) / (ds.max_s_22 - ds.min_s_22)
    np.testing.assert_allclose(v[..., 0][void], zero_u1, atol=1e-5)
    np.testing.assert_allclose(v[..., 1][void], zero_u2, atol=1e-5)
    np.testing.assert_allclose(v[..., 2][void], 0.0, atol=1e-5)  # s_mises
    np.testing.assert_allclose(v[..., 3][void], zero_s22, atol=1e-5)
    assert ds.zero_u_2 == pytest.approx(zero_u2)


def test_val_reuses_train_scaling(synth, tmp_path):
    val_folder = tmp_path / "val"
    make_synthetic_dataset(val_folder, num_samples=2, image_size=24,
                           num_frames=5, seed=99)
    train = _ds(synth)
    val = _ds(val_folder, labels_scaling=train.labels_scaling)
    assert val.labels_scaling is train.labels_scaling


def test_interpolate_labels_first_point_at_one_percent():
    labels = np.linspace(0, 1, 51)[None, :]
    out = interpolate_labels(labels, 11)
    assert out.shape == (1, 11)
    # first eval point at 1% of 0.2 strain -> value 0.01
    np.testing.assert_allclose(out[0, 0], 0.01, atol=1e-6)
    np.testing.assert_allclose(out[0, -1], 1.0, atol=1e-6)


def test_batch_matches_item(synth):
    ds = _ds(synth)
    vb, lb = ds.get_batch([0, 2])
    v0, l0 = ds[0]
    np.testing.assert_allclose(vb[0], v0)
    np.testing.assert_allclose(lb[0], l0)


def test_prefetch_matches_direct_iteration(synth):
    from videometamaterials_tpu.data.loader import (
        InfiniteBatchSampler,
        prefetch_batches,
    )
    ds = _ds(synth)
    s1 = InfiniteBatchSampler(len(ds), 2, seed=7)
    s2 = InfiniteBatchSampler(len(ds), 2, seed=7)
    it_direct = iter(s1)
    it_pref = prefetch_batches(ds, s2)
    for _ in range(5):
        idx = next(it_direct)
        v_want, l_want = ds.get_batch(idx)
        v_got, l_got = next(it_pref)
        np.testing.assert_allclose(v_got, v_want)
        np.testing.assert_allclose(l_got, l_want)


def test_horizontal_flip_augmentation(synth):
    ds = _ds(synth, horizontal_flip=True, rebuild_cache=False)
    ds_ref = _ds(synth)
    # with a fixed flip rng, repeated large batches must contain both
    # flipped and unflipped variants of sample 0
    seen_flip, seen_plain = False, False
    v_ref, _ = ds_ref.get_batch([0])
    for _ in range(10):
        v, _ = ds.get_batch([0])
        if np.allclose(v[0], v_ref[0]):
            seen_plain = True
        elif np.allclose(v[0], v_ref[0][:, :, ::-1, :]):
            seen_flip = True
    assert seen_flip and seen_plain


def test_gif_to_array_nonuniform_merged_frames(tmp_path):
    """GIF encoders merge identical consecutive frames into one frame with an
    extended duration; inversion must reproduce the true sequence even when
    the merges are UNEVEN (vddp.py:1077-1104 round-trip contract)."""
    from PIL import Image

    from videometamaterials_tpu.data.gif_io import gif_to_array

    a = np.full((8, 8), 10, np.uint8)
    b = np.full((8, 8), 120, np.uint8)
    c = np.full((8, 8), 240, np.uint8)
    imgs = [Image.fromarray(f, mode="L").convert("P") for f in (a, b, c)]
    path = tmp_path / "merged.gif"
    # true sequence: A A A B C C  (base unit 100 ms)
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=[300, 100, 200], loop=0, optimize=False)

    out = gif_to_array(path, expected_frames=6)
    assert out.shape == (6, 8, 8)
    seq = [int(f.mean() > 170) * 2 or int(f.mean() > 60) for f in out]
    assert seq == [0, 0, 0, 1, 2, 2]


def test_gif_to_array_rounding_never_drifts(tmp_path):
    """Cumulative rounding: totals match expected_frames exactly for awkward
    duration ratios (the old per-frame round + tail patch mis-expanded)."""
    from PIL import Image

    from videometamaterials_tpu.data.gif_io import gif_to_array

    frames = [np.full((4, 4), v, np.uint8) for v in (0, 60, 120, 180, 240)]
    imgs = [Image.fromarray(f, mode="L").convert("P") for f in frames]
    path = tmp_path / "awkward.gif"
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=[250, 250, 300, 150, 50], loop=0, optimize=False)
    out = gif_to_array(path, expected_frames=10)
    assert out.shape[0] == 10
