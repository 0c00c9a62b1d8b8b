"""Physically-consistent synthetic dataset (data/synthetic.py:
make_consistent_dataset): the conditioning stress-strain curve must be
recoverable from the s_22 pixel field through the FULL artifact pipeline —
dataset decode -> save_preds grid GIFs -> crop -> unnormalize -> pixel curve
estimate (the quality-demo protocol replacing the reference's FEM loop,
vddp.py:1674-1753 + src/utils.py:94-144).

A perfectly reproduced video must land at the uint8-quantization NRMSE floor;
this pins the analytic-consistency contract the round-3 quality
demonstration relies on."""

import numpy as np
import pytest

from videometamaterials_tpu.data.dataset import VideoDataset, \
    interpolate_labels
from videometamaterials_tpu.data.synthetic import make_consistent_dataset
from videometamaterials_tpu.postproc.metrics import compute_NRMSE
from videometamaterials_tpu.postproc.visualization import (
    estimate_stress_strain,
    load_cell_fields,
)
from videometamaterials_tpu.training.artifacts import save_preds

FRAMES = 5


@pytest.fixture(scope="module")
def consistent_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("consistent")
    data_dir = root / "train"
    make_consistent_dataset(data_dir, num_samples=3, image_size=96,
                            num_frames=FRAMES, seed=0)
    ds = VideoDataset(data_dir, 96, selected_channels=[0, 1, 3],
                      num_frames=FRAMES, per_frame_cond=True,
                      reference_frame="lagrangian")
    return root, data_dir, ds


def test_curve_recoverable_from_ground_truth_video(consistent_run):
    root, data_dir, ds = consistent_run
    videos, _ = ds.get_batch(np.arange(len(ds)))
    out_dir = root / "step_0"
    save_preds(videos, out_dir, selected_channels=[0, 1, 3],
               num_samples=len(ds), reference_frame="lagrangian",
               num_frames=FRAMES, zero_u_2=ds.zero_u_2)

    raw_curves = np.genfromtxt(data_dir / "stress_strain_data.csv",
                               delimiter=",")
    targets = interpolate_labels(raw_curves, FRAMES)

    gifs = str(out_dir / "gifs") + "/"
    for i in range(len(ds)):
        fields = load_cell_fields(gifs, str(data_dir /
                                            "frame_range_data.csv"),
                                  row=i, col=0, ref_frame="lagrangian")
        _, est = estimate_stress_strain(fields["s22"], "lagrangian")
        nrmse = compute_NRMSE(targets[i], est)
        assert nrmse < 0.05, (i, nrmse, targets[i], est)


def test_topology_reconstruction_matches_geometry(consistent_run):
    """The near-zero-u2 topology rule must recover the generating cell."""
    root, data_dir, ds = consistent_run
    videos, _ = ds.get_batch(np.arange(1))
    out_dir = root / "step_topo"
    save_preds(videos, out_dir, selected_channels=[0, 1, 3],
               num_samples=1, reference_frame="lagrangian",
               num_frames=FRAMES, zero_u_2=ds.zero_u_2)
    import imageio.v2 as imageio
    cell = np.asarray(imageio.mimread(
        data_dir / "gifs" / "topo" / "0.gif")[0])
    if cell.ndim == 3:
        cell = cell[..., 0]
    cell = (cell > 127).astype(float)

    gifs = str(out_dir / "gifs") + "/"
    fields = load_cell_fields(gifs, str(data_dir / "frame_range_data.csv"),
                              row=0, col=0, ref_frame="lagrangian")
    topo = fields["mask"][0].astype(float)
    agreement = (topo == cell).mean()
    assert agreement > 0.98, agreement


def test_label_normalization_roundtrip(consistent_run):
    _, data_dir, ds = consistent_run
    raw_curves = np.genfromtxt(data_dir / "stress_strain_data.csv",
                               delimiter=",")
    targets = interpolate_labels(raw_curves, FRAMES)
    back = ds.labels_scaling.unnormalize(ds.labels)
    np.testing.assert_allclose(back, targets, rtol=1e-4, atol=1e-5)
