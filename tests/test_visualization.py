"""Visualization stack: grid GIF cropping, Lagrangian->Eulerian remap, and
create_visualization artifact contract (on 96x96 cells, the hardcoded cell
size shared with the reference, src/utils.py:272-307)."""

import numpy as np
import pytest

from videometamaterials_tpu.postproc.remap import (
    crop_gif,
    smooth_frame,
    update_pixel_positions,
)
from videometamaterials_tpu.postproc.visualization import create_visualization
from videometamaterials_tpu.training.artifacts import save_preds

FRAMES = 3


@pytest.fixture(scope="module")
def pred_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("viz") / "step_1"
    rng = np.random.default_rng(0)
    videos = rng.uniform(0.3, 0.9, size=(4, FRAMES, 96, 96, 3))
    save_preds(videos, out, selected_channels=[0, 1, 3], num_samples=2,
               reference_frame="lagrangian", num_frames=FRAMES,
               zero_u_2=0.45)
    return out


def test_crop_gif_extracts_cell(pred_dir):
    frames = crop_gif(str(pred_dir / "gifs" / "prediction_channel_0.gif"),
                      1, 1, save=False)
    assert frames.shape == (FRAMES, 96, 96)


def test_update_pixel_positions_wraps_x():
    f, p = 1, 8
    shift_x = np.full((f, p, p), 3)
    shift_y = np.zeros((f, p, p), dtype=int)
    vals = np.arange(f * p * p).reshape(f, p, p).astype(float)
    binm = np.ones((f, p, p))
    out = update_pixel_positions(shift_x, shift_y, vals, binm)
    # column 7 shifted by 3 wraps to column 2
    assert out[0, 0, (7 + 3) % p] == vals[0, 0, 7]


def test_smooth_frame_fills_holes():
    f = np.ones((6, 6))
    f[2, 2] = 0.0
    out = smooth_frame(f)
    assert out[2, 2] != 0.0


def test_create_visualization_lagrangian(pred_dir, tmp_path):
    fr = np.array([[-0.1, 0.1, -0.25, 0.02, 3.0, -2.0, 0.5, 1.0]])
    fr_csv = tmp_path / "frame_range_data.csv"
    np.savetxt(fr_csv, fr, delimiter=",")
    out = create_visualization(str(pred_dir / "gifs") + "/", str(fr_csv),
                               0, 1, ref_frame="lagrangian")
    from pathlib import Path
    out = Path(out)
    assert (out / "visualization.gif").exists()
    assert (out / "visualization_conv_euler.gif").exists()
    assert (out / "visualization_legend.png").exists()
    curve = np.genfromtxt(out / "stress_strain_estimate.csv", delimiter=",",
                          names=True)
    assert len(curve) == FRAMES
    # zero-shift: linearization through the first two points hits 0 at 0
    s, v = curve["strain"], curve["pred_pixel_shifted"]
    extrap = v[0] - (v[1] - v[0]) / (s[1] - s[0]) * s[0]
    np.testing.assert_allclose(extrap, 0.0, atol=1e-8)


def test_create_visualization_eulerian(tmp_path):
    rng = np.random.default_rng(1)
    videos = rng.uniform(0.0, 1.0, size=(1, FRAMES, 96, 96, 4))
    out_dir = tmp_path / "step_e"
    save_preds(videos, out_dir, selected_channels=[0, 1, 2, 3],
               num_samples=1, reference_frame="eulerian", num_frames=FRAMES,
               zero_u_2=None)
    fr = np.array([[3.0, -2.0, 0.5, 1.0]])
    fr_csv = tmp_path / "frame_range.csv"
    np.savetxt(fr_csv, fr, delimiter=",")
    out = create_visualization(str(out_dir / "gifs") + "/", str(fr_csv),
                               0, 0, ref_frame="eulerian")
    from pathlib import Path
    assert (Path(out) / "visualization.gif").exists()


def test_load_frame_ranges_single_row_trailing_delimiter(tmp_path):
    """A 1-row frame_range file with a trailing comma (NaN last column)
    must be used as-is, not filtered to an empty array (regression: the
    row-NaN filter crashed the min/max reductions)."""
    from videometamaterials_tpu.postproc.visualization import (
        load_frame_ranges,
    )

    f = tmp_path / "frame_range.csv"
    f.write_text("1.0,2.0,3.0,4.0,\n")
    u_ranges, (lo, hi) = load_frame_ranges(str(f), "eulerian")
    assert u_ranges is None
    assert (lo, hi) == (2.0, 3.0)
