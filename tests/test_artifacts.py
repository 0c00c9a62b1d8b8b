"""Artifact export layout contract (vddp.py:1870-1918): grid placement,
topology extraction conventions (quarter selection, flip, transpose)."""

import numpy as np

from videometamaterials_tpu.training.artifacts import (
    extract_topologies,
    make_grid_video,
)


def test_grid_places_samples_row_major():
    # 2 conditionings x 2 preds, each video a constant = its index
    n, f, h, w, c = 4, 2, 6, 6, 1
    videos = np.stack([np.full((f, h, w, c), i, np.float32)
                       for i in range(n)])
    grid = make_grid_video(videos, rows=2, pad=1)
    assert grid.shape == (c, f, 2 * (h + 2), 2 * (w + 2))
    # center pixel of each cell: row-major order (repeat_interleave layout)
    ph = h + 2
    assert grid[0, 0, ph // 2, ph // 2] == 0          # (row 0, col 0)
    assert grid[0, 0, ph // 2, ph + ph // 2] == 1     # (row 0, col 1)
    assert grid[0, 0, ph + ph // 2, ph // 2] == 2     # (row 1, col 0)
    assert grid[0, 0, ph + ph // 2, ph + ph // 2] == 3
    # padding ring is zero
    assert grid[0, 0, 0, 0] == 0


def test_lagrangian_topology_upper_left_flip_transpose():
    n, f, hw = 1, 3, 8
    zero_u2 = 0.5
    vids = np.full((n, f, hw, hw, 3), zero_u2, np.float32)
    # one material pixel in the UPPER-LEFT quarter at (row 0, col 1): its
    # u_2 deviates from the zero-displacement value in one frame
    vids[0, 1, 0, 1, 1] = 0.9
    topo = extract_topologies(vids, "lagrangian", num_frames=f,
                              zero_u_2=zero_u2)
    assert topo.shape == (1, 4, 4)
    # upper-left quarter flipped vertically: row 0 -> row 3; then the final
    # transpose swaps axes => material lands at (col, flipped_row) = (1, 3)
    expected = np.zeros((4, 4))
    expected[1, 3] = 1
    np.testing.assert_array_equal(topo[0], expected)


def test_eulerian_topology_bottom_left_first_frame():
    n, f, hw = 1, 2, 8
    vids = np.zeros((n, f, hw, hw, 4), np.float32)
    vids[0, 0, 5, 2, 0] = 1.0      # bottom-left quarter, channel 0, frame 0
    vids[0, 1, 5, 2, 0] = 0.0      # later frames ignored
    topo = extract_topologies(vids, "eulerian", num_frames=f, zero_u_2=None)
    # bottom half starts at row 4: local row = 1, col = 2; transposed -> (2,1)
    assert topo[0, 2, 1] == 1.0
    assert topo.sum() == 1.0
