"""FEM side stack: GRF sampling constraints, wrapper command construction,
and CSV->GIF conversion (everything except the Abaqus solve itself)."""

import numpy as np
import pytest

from videometamaterials_tpu.fem.eval_abaqus import (
    abaqus_command,
    convert_frames_to_gifs,
    evaluate_sample,
)
from videometamaterials_tpu.fem.grf import (
    gaussian_random_field,
    generate_geometry,
)


def test_grf_statistics():
    f = gaussian_random_field(alpha=4.0, size=32, seed=1)
    assert f.shape == (32, 32)
    assert abs(f.mean()) < 1e-10
    np.testing.assert_allclose(f.std(), 1.0, rtol=1e-10)


def test_generate_geometry_constraints():
    rng = np.random.default_rng(0)
    geom = generate_geometry(3.0, 16, 0.1, 0.4, rng=rng).reshape(16, 16)
    assert set(np.unique(geom)) <= {0, 1}
    thresh = int(16 * 0.1)
    assert geom[:, 0].sum() >= thresh and geom[:, -1].sum() >= thresh
    assert geom[0, :].sum() >= thresh and geom[-1, :].sum() >= thresh
    from scipy import ndimage
    _, num = ndimage.label(
        geom, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    assert num == 1


def test_abaqus_command_format():
    cmd = abaqus_command("abq.py", "samples", 3, True, 48)
    assert cmd == ("abaqus cae noGUI=abq.py -- --samples_path samples "
                   "--sample_index 3 --store_frames True --pixels 48")
    # the reference's in-file toggles (abaqus_script.py:49-59) ride along as
    # flags the builder script parses
    cmd = abaqus_command("abq.py", "samples", 3, True, 48,
                         solver="explicit", material="neo_hooke",
                         y_periodicity=True, bounding_box=True, radius=0.01)
    for part in ("--solver explicit", "--material neo_hooke",
                 "--y_periodicity True", "--bounding_box True",
                 "--radius 0.01"):
        assert part in cmd


def _write_fake_csvs(csv_dir, pixels=8, frames=3, lagr=True):
    csv_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    names = ["geometry", "s_mises", "s_22", "strain_energy_dens"]
    for n in names:
        arr = rng.uniform(size=(frames * pixels, pixels))
        np.savetxt(csv_dir / f"{n}_frames_eul.csv", arr, delimiter=",")
    if lagr:
        for n in ["u_1", "u_2", "s_mises", "s_22", "strain_energy_dens",
                  "geometry"]:
            arr = rng.uniform(size=(frames * pixels, pixels)) - 0.5
            np.savetxt(csv_dir / f"{n}_frames_lagr.csv", arr, delimiter=",")


@pytest.mark.parametrize("frame", ["eulerian", "lagrangian"])
def test_convert_frames_to_gifs(tmp_path, frame):
    _write_fake_csvs(tmp_path / "csv")
    gif_dir = convert_frames_to_gifs(tmp_path / "csv", tmp_path / "gif",
                                     reference_frame=frame, pixels=8,
                                     num_frames=3)
    gifs = sorted(gif_dir.glob("prediction_channel_*.gif"))
    assert len(gifs) == 4
    fr = np.genfromtxt(gif_dir / "frame_range.csv", delimiter=",",
                       names=True)
    expect = (4 if frame == "eulerian" else 8)
    assert len(fr.dtype.names) == expect


def test_evaluate_sample_with_injected_runner(tmp_path):
    """Full wrapper flow with a fake Abaqus that writes the CSVs."""
    samples = tmp_path / "samples"
    samples.mkdir()
    np.savetxt(samples / "geometries.csv", np.ones((2, 64)), delimiter=",")

    seen = {}

    def fake_runner(cmd, cwd):
        seen["cmd"] = cmd
        _write_fake_csvs(cwd / "csv", pixels=16, frames=3)

    gif_dir = evaluate_sample(samples, sample_index=1, pixels=8,
                              abaqus_runner=fake_runner)
    assert "--sample_index 1" in seen["cmd"]
    assert gif_dir is not None
    assert (gif_dir / "frame_range.csv").exists()
