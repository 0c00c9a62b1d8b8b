"""Guided-fidelity scoring of saved eval artifacts (host side).

The pixel-estimated stress-strain protocol of scripts/eval_demo_quality.py
factored into a library function so the Trainer's milestone fidelity probe
and the post-hoc quality reports score through the IDENTICAL code path
(load_cell_fields -> estimate_stress_strain -> NRMSE; the pixel estimate is
exact on the physically-consistent synthetic corpus, pinned by
tests/test_consistent_dataset.py). Mirrors the reference evaluation
protocol (src/utils.py:94-144) with the FEM loop replaced by the pixel
estimate.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def score_gifs_dir(gifs_dir: str | Path, frame_ranges_csv: str | Path,
                   targets: np.ndarray, num_preds: int,
                   ref_frame: str) -> tuple[float, list[float]]:
    """Best-of-N pixel-curve NRMSE of a saved prediction grid.

    gifs_dir: directory holding prediction_channel_<c>.gif grids (rows =
    targets, cols = predictions, the save_preds layout, vddp.py:1880-1888).
    targets: (n_targets, num_frames) physical target curves (already at
    frame resolution). Returns (mean best-of-N NRMSE, per-target list).
    """
    from videometamaterials_tpu.postproc.metrics import compute_NRMSE
    from videometamaterials_tpu.postproc.visualization import (
        estimate_stress_strain,
        load_cell_fields,
    )

    gifs = str(gifs_dir).rstrip("/") + "/"
    best = []
    for row in range(len(targets)):
        errs = []
        for col in range(num_preds):
            fields = load_cell_fields(gifs, str(frame_ranges_csv), row, col,
                                      ref_frame=ref_frame)
            _, est = estimate_stress_strain(fields["s22"], ref_frame)
            errs.append(float(compute_NRMSE(targets[row], est)))
        best.append(min(errs))
    return float(np.mean(best)), best
