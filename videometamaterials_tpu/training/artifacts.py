"""Prediction artifact export — contract-frozen with the reference.

save_preds (vddp.py:1870-1918): writes per-channel grid GIFs
(gifs/prediction_channel_<c>.gif, rows = conditionings, cols = predictions,
2px padding) and extracts the material geometry into geometries.csv (48x48
binary rows, cleaned, transposed to the Abaqus convention) so eval_abaqus.py
and gif_visualization.py operate unchanged on our outputs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from videometamaterials_tpu.data.gif_io import array_to_gif
from videometamaterials_tpu.postproc.geometry import clean_pred


def make_grid_video(videos: np.ndarray, rows: int, pad: int = 2) -> np.ndarray:
    """(n, F, H, W, C) -> (C, F, rows*(H+2p), cols*(W+2p)); n = rows*cols,
    row-major (repeat_interleave layout: row = conditioning, col = pred)."""
    n, f, h, w, c = videos.shape
    assert n % rows == 0, f"{n} videos not divisible into {rows} rows"
    cols = n // rows
    padded = np.pad(videos, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    ph, pw = h + 2 * pad, w + 2 * pad
    grid = padded.reshape(rows, cols, f, ph, pw, c)
    grid = grid.transpose(5, 2, 0, 3, 1, 4).reshape(c, f, rows * ph,
                                                    cols * pw)
    return grid


def extract_topologies(videos: np.ndarray, reference_frame: str,
                       num_frames: int, zero_u_2: float | None,
                       atol: float = 0.02) -> np.ndarray:
    """(n, F, H, W, C) [0,1] predictions -> (n, H/2, W/2) float topologies
    (pre-cleanup), per vddp.py:1890-1913.

    lagrangian: upper-left quarter, flipped vertically; a pixel is material
    iff its u_2 channel (index 1 of the selected channels) is NOT close to
    the normalized zero-displacement value in all frames.
    eulerian / 1-frame: bottom-left quarter, channel 0 of frame 0."""
    n, f, h, w, c = videos.shape
    half = h // 2
    if reference_frame == "eulerian" or (reference_frame == "lagrangian"
                                         and num_frames == 1):
        red = videos[:, :, half:, :half, :]
        topologies = red[:, 0, :, :, 0]
    elif reference_frame == "lagrangian":
        assert zero_u_2 is not None
        red = videos[:, :, :half, :half, :][:, :, ::-1, :, :]  # flip H
        close = np.isclose(red[:, :, :, :, 1], zero_u_2, atol=atol)
        all_match = np.all(close, axis=1)        # over frames
        topologies = np.logical_not(all_match).astype(np.float32)
    else:
        raise ValueError(reference_frame)
    # transpose for Abaqus consistency (vddp.py:1913)
    return topologies.transpose(0, 2, 1)


def save_preds(videos: np.ndarray, save_dir: str | Path,
               selected_channels, num_samples: int, reference_frame: str,
               num_frames: int, zero_u_2: float | None) -> Path:
    """videos: (n, F, H, W, C) float in [0,1], n = num_samples * num_preds."""
    save_dir = Path(save_dir)
    (save_dir / "gifs").mkdir(parents=True, exist_ok=True)

    grid = make_grid_video(np.asarray(videos), rows=num_samples)
    for j, ch in enumerate(selected_channels):
        array_to_gif(grid[j], save_dir / "gifs" /
                     f"prediction_channel_{ch}.gif")

    topologies = extract_topologies(np.asarray(videos), reference_frame,
                                    num_frames, zero_u_2)
    pixels = topologies.shape[1]
    cleaned = clean_pred(topologies.reshape(len(topologies), -1), pixels)
    np.savetxt(save_dir / "geometries.csv", cleaned, delimiter=",",
               comments="")
    return save_dir / "geometries.csv"
