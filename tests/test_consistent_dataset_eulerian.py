"""Eulerian-frame physically-consistent synthetic dataset
(data/synthetic.py: make_consistent_dataset_eulerian): the conditioning
stress-strain curve must be recoverable from the s_22 pixel field through
the FULL artifact pipeline — dataset decode -> save_preds grid GIFs ->
crop -> unnormalize -> EULERIAN window pixel estimate
(src/utils.py:396-403: mean of the bottom floor((1-eps)*H) rows).

Sibling of tests/test_consistent_dataset.py (lagrangian); together they
pin the analytic-consistency contract for BOTH reference frames the
quality demonstrations rely on."""

import numpy as np
import pytest

from videometamaterials_tpu.data.dataset import VideoDataset, \
    interpolate_labels
from videometamaterials_tpu.data.synthetic import \
    make_consistent_dataset_eulerian
from videometamaterials_tpu.postproc.metrics import compute_NRMSE
from videometamaterials_tpu.postproc.visualization import (
    estimate_stress_strain,
    load_cell_fields,
)
from videometamaterials_tpu.training.artifacts import save_preds

FRAMES = 5
CHANNELS = [0, 1, 2, 3]   # topo, s_mises, s_22, ener


@pytest.fixture(scope="module")
def consistent_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("consistent_euler")
    data_dir = root / "train"
    make_consistent_dataset_eulerian(data_dir, num_samples=3, image_size=96,
                                     num_frames=FRAMES, seed=0)
    ds = VideoDataset(data_dir, 96, selected_channels=CHANNELS,
                      num_frames=FRAMES, per_frame_cond=True,
                      reference_frame="eulerian")
    return root, data_dir, ds


def test_curve_recoverable_from_ground_truth_video(consistent_run):
    root, data_dir, ds = consistent_run
    videos, _ = ds.get_batch(np.arange(len(ds)))
    out_dir = root / "step_0"
    save_preds(videos, out_dir, selected_channels=CHANNELS,
               num_samples=len(ds), reference_frame="eulerian",
               num_frames=FRAMES, zero_u_2=ds.zero_u_2)

    raw_curves = np.genfromtxt(data_dir / "stress_strain_data.csv",
                               delimiter=",")
    targets = interpolate_labels(raw_curves, FRAMES)

    gifs = str(out_dir / "gifs") + "/"
    for i in range(len(ds)):
        fields = load_cell_fields(gifs, str(data_dir /
                                            "frame_range_data.csv"),
                                  row=i, col=0, ref_frame="eulerian")
        _, est = estimate_stress_strain(fields["s22"], "eulerian")
        nrmse = compute_NRMSE(targets[i], est)
        assert nrmse < 0.05, (i, nrmse, targets[i], est)


def test_frame_range_schema_and_mask(consistent_run):
    """4-column eulerian frame_range_data.csv + solid fraction sane and the
    s_22 field vanishing outside the deformed-configuration mask."""
    _, data_dir, ds = consistent_run
    fr = np.genfromtxt(data_dir / "frame_range_data.csv", delimiter=",")
    assert fr.shape == (3, 4)
    assert (fr[:, 0] > 0).all()          # max_s_mises
    assert (fr[:, 1] < 0).all()          # min_s_22 (compression)
    assert (fr[:, 2] >= 0).all()         # max_s_22

    videos, _ = ds.get_batch(np.arange(1))
    topo = videos[0, ..., 0] > 0.5
    s22 = videos[0, ..., 2]
    # get_batch renormalizes to DATASET-GLOBAL bounds; void pixels are
    # zeroed in physical space, i.e. land at the global zero-stress value
    zero = (0.0 - ds.min_s_22) / (ds.max_s_22 - ds.min_s_22)
    assert np.allclose(s22[~topo], zero, atol=2 / 255)
