"""clean_pred parity with the reference algorithm (src/utils.py:32-82),
oracled by a literal networkx re-implementation."""

import networkx as nx
import numpy as np

from videometamaterials_tpu.postproc.geometry import clean_pred


def _reference_clean_pred(geom_pred_raw, pixels):
    """Literal re-derivation of the reference algorithm for testing."""
    raw = np.array(geom_pred_raw, dtype=float)
    raw[raw < 0.5] = 0
    raw[raw > 0.5] = 1
    geom_pred = raw.astype("int")
    out = np.zeros(geom_pred.shape).reshape(-1, pixels, pixels).astype("int")
    for i in range(geom_pred.shape[0]):
        g = geom_pred[i].reshape(pixels, pixels)
        for j in range(pixels):
            for k in range(pixels):
                neigh = np.full(4, True)
                if j != 0 and not g[j - 1, k]:
                    neigh[0] = False
                if j == 0:
                    pass
                if j != pixels - 1 and not g[j + 1, k]:
                    neigh[1] = False
                if k != 0 and not g[j, k - 1]:
                    neigh[2] = False
                if k != pixels - 1 and not g[j, k + 1]:
                    neigh[3] = False
                if (~neigh).all():
                    g[j, k] = 0
        G = nx.Graph()
        hx, hy = np.where(g[1:].astype(bool) & g[:-1].astype(bool))
        G.add_edges_from(zip(map(tuple, np.array([hx, hy]).T),
                             map(tuple, np.array([hx, hy]).T + (1, 0))))
        vx, vy = np.where(g[:, 1:].astype(bool) & g[:, :-1].astype(bool))
        G.add_edges_from(zip(map(tuple, np.array([vx, vy]).T),
                             map(tuple, np.array([vx, vy]).T + (0, 1))))
        red = np.zeros((pixels, pixels)).astype("int")
        if len(G) > 0:
            comp = max(nx.connected_components(G), key=len)
            for (a, b) in comp:
                red[a, b] = 1
        out[i] = red
    return out.reshape(-1, pixels ** 2)


def test_clean_pred_matches_reference_oracle():
    rng = np.random.default_rng(0)
    pixels = 12
    batch = rng.uniform(size=(5, pixels * pixels))
    got = clean_pred(batch.copy(), pixels)
    want = _reference_clean_pred(batch.copy(), pixels)
    # components tie-break can differ only when two equally-large components
    # exist; random floats make that measure-zero
    np.testing.assert_array_equal(got, want)


def test_clean_pred_removes_speckles_and_islands():
    pixels = 8
    g = np.zeros((pixels, pixels))
    g[1:4, 1:4] = 1        # main blob (9 px)
    g[6, 6] = 1            # isolated pixel -> removed
    g[5, 0] = 1
    g[6, 0] = 1            # 2-px island -> smaller component, removed
    out = clean_pred(g.reshape(1, -1), pixels).reshape(pixels, pixels)
    assert out.sum() == 9
    assert out[6, 6] == 0 and out[5, 0] == 0


def test_clean_pred_empty_input():
    out = clean_pred(np.zeros((2, 16)), 4)
    assert out.shape == (2, 16)
    assert out.sum() == 0
