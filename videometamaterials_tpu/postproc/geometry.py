"""Geometry extraction and cleanup (host-side, contract-frozen).

Re-design of src/utils.py:11-82: binarize a predicted topology at 0.5, remove
speckle pixels, and keep only the largest 4-connected component so the
geometry can be meshed by FEM. Connected components use scipy.ndimage.label
(C implementation) instead of building a networkx pixel graph — same result,
orders of magnitude faster.

Behavioral notes kept bit-faithful:
  - the speckle pre-pass scans pixels in row-major order and removes in place,
    so removals cascade within one pass (reference loop src/utils.py:46-62);
  - values exactly equal to 0.5 stay at 0.5 through the reference's two
    comparisons and then count as falsy only if 0 — the reference leaves 0.5
    unchanged (both strict inequalities); we binarize them to 1 via
    `astype(int)` only after the same strict thresholding.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def remove_isolated_pixels(geom: np.ndarray) -> np.ndarray:
    """In-place scan-order removal of pixels whose 4 neighbors are all void
    (src/utils.py:46-62 semantics, including cascade within the pass)."""
    g = geom.copy()
    p = g.shape[0]
    for j in range(p):
        for k in range(p):
            if not g[j, k]:
                continue
            has_neighbor = False
            if j != 0 and g[j - 1, k]:
                has_neighbor = True
            if not has_neighbor and j != p - 1 and g[j + 1, k]:
                has_neighbor = True
            if not has_neighbor and k != 0 and g[j, k - 1]:
                has_neighbor = True
            if not has_neighbor and k != p - 1 and g[j, k + 1]:
                has_neighbor = True
            if not has_neighbor:
                g[j, k] = 0
    return g


def largest_component(geom: np.ndarray) -> np.ndarray:
    """Keep only the largest 4-connected component (src/utils.py:64-78)."""
    labels, num = ndimage.label(geom, structure=_CROSS)
    if num == 0:
        return np.zeros_like(geom)
    counts = np.bincount(labels.ravel())
    counts[0] = 0
    keep = counts.argmax()
    return (labels == keep).astype(geom.dtype)


def clean_pred(geom_pred_raw: np.ndarray, pixels: int) -> np.ndarray:
    """(N, pixels*pixels) or (N, pixels, pixels) float predictions ->
    (N, pixels**2) cleaned binary rows (src/utils.py:32-82)."""
    raw = np.array(geom_pred_raw, dtype=np.float64).reshape(-1, pixels, pixels)
    # strict thresholding as in the reference (0.5 itself is untouched there;
    # astype(int) then maps it to 0)
    raw[raw < 0.5] = 0
    raw[raw > 0.5] = 1
    geom = raw.astype(int)

    out = np.zeros_like(geom)
    for i in range(geom.shape[0]):
        g = remove_isolated_pixels(geom[i])
        out[i] = largest_component(g)
    return out.reshape(-1, pixels ** 2)
