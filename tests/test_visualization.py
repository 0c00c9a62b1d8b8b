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


# ---------------------------------------------------------------- robust topo
def _synthetic_u2(offset: int = 0):
    """(F, 96, 96) uint8 u2 channel of a mirrored GRF-like cell: voids at
    the zero-displacement level (255), solids descending over frames, the
    whole video optionally shifted down by `offset` levels (the painted-void
    drift of lightly-trained generated videos)."""
    rng = np.random.default_rng(3)
    q = (rng.random((48, 48)) < 0.4).astype(float)
    top = np.concatenate([q, np.flip(q, 0)], 0)
    cell = np.concatenate([top, np.flip(top, 1)], 1)
    t = np.linspace(0, 1, 11)[:, None, None]
    u2 = 255.0 * (1.0 - 0.8 * t * cell[None])
    return np.clip(u2 - offset, 0, 255).astype(np.uint8), cell


def test_reconstruct_topology_robust_recovers_offset_video():
    """The temporal-contrast rule recovers the geometry exactly even when
    the painted values carry a global offset that defeats the reference
    zero-level rule (the round-5 constant-gain artifact)."""
    from videometamaterials_tpu.postproc.visualization import (
        reconstruct_topology,
        reconstruct_topology_robust,
    )

    u2, cell = _synthetic_u2(offset=30)
    ref = reconstruct_topology(u2, min_u_2=-0.2, max_u_2=0.0)
    assert ref.mean() == 1.0          # reference rule: degenerate all-solid
    robust = reconstruct_topology_robust(u2)
    np.testing.assert_array_equal(robust, cell)


def test_reconstruct_topology_robust_degenerate_returns_all_solid():
    from videometamaterials_tpu.postproc.visualization import (
        reconstruct_topology_robust,
    )

    flat = np.full((11, 96, 96), 200, np.uint8)   # motionless video
    assert reconstruct_topology_robust(flat).mean() == 1.0


def test_load_cell_fields_auto_prefers_reference_rule(tmp_path):
    """On well-painted videos the reference rule already yields a plausible
    mask and auto mode must NOT swap it out; on offset videos auto falls
    back to the temporal-contrast mask."""
    import imageio.v2 as imageio

    from videometamaterials_tpu.postproc.visualization import load_cell_fields

    fr = tmp_path / "frame_range_data.csv"
    np.savetxt(fr, np.array([[0.0, 0.05, -0.2, 0.0, 1.0, -1.0, 0.0, 1.0]]),
               delimiter=",")

    for offset, expect_rho in ((0, None), (30, None)):
        u2, cell = _synthetic_u2(offset=offset)
        d = tmp_path / f"off{offset}"
        (d / "gifs").mkdir(parents=True)
        for c in (0, 1, 3):
            imageio.mimsave(d / "gifs" / f"prediction_channel_{c}.gif",
                            list(u2), duration=0.2)
        fields = load_cell_fields(str(d / "gifs") + "/", str(fr), 0, 0,
                                  ref_frame="lagrangian")
        np.testing.assert_array_equal(fields["mask"][0].astype(float), cell)
