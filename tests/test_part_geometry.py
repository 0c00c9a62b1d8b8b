"""Pure-numpy FEM part geometry: loop tracing, corner reduction, spline
anchoring and radius corner-rounding (reference abaqus_script.py:79-289),
verified on hand-computed pixel cases."""

import numpy as np
import pytest

from videometamaterials_tpu.fem.part_geometry import (
    apply_bounding_box,
    mirror_periodic,
    reduce_loop_to_corners,
    sketch_plan,
    trace_pixel_loops,
)


def _corner_set(loop):
    return {(round(float(x), 6), round(float(y), 6)) for x, y in loop[:-1]}


def test_single_pixel_square():
    g = np.zeros((4, 4))
    g[1, 2] = 1              # row 1, col 2 -> x in [0.5, 0.75], y in [0.5, 0.75]
    loops = trace_pixel_loops(g)
    assert len(loops) == 1
    corners = reduce_loop_to_corners(loops[0])
    assert _corner_set(corners) == {(0.5, 0.5), (0.75, 0.5),
                                    (0.75, 0.75), (0.5, 0.75)}
    plan = sketch_plan(g, splined=False, radius=0.0)
    lines = [s for s in plan["segments"] if s[0] == "line"]
    assert len(lines) == 4
    assert len(plan["surf_probes"]) == 1
    assert len(plan["surf_probes"][0]) == 4
    ix, iy = plan["interior_point"]
    assert 0.5 < ix < 0.75 and 0.5 < iy < 0.75


def test_l_shape_has_six_corners():
    g = np.zeros((4, 4))
    g[2, 1] = g[3, 1] = g[3, 2] = 1      # an L of three pixels
    corners = reduce_loop_to_corners(trace_pixel_loops(g)[0])
    assert len(corners) - 1 == 6
    assert (0.5, 0.25) in _corner_set(corners)   # the inner corner


def test_hole_gives_inner_loop_closed_spline():
    g = np.ones((4, 4))
    g[1:3, 1:3] = 0          # square hole
    plan = sketch_plan(g, splined=True, radius=0.0)
    splines = [s for s in plan["segments"] if s[0] == "spline"]
    # outer loop = domain boundary -> all straight lines; hole -> ONE closed
    # spline through its 4 segment midpoints (abaqus_script.py:236-243)
    assert len(splines) == 1
    pts = splines[0][1]
    assert pts[0] == pts[-1]             # closed
    assert len(pts) == 5
    mids = {(round(p[0], 6), round(p[1], 6)) for p in pts}
    assert mids == {(0.5, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 0.5)}
    lines = [s for s in plan["segments"] if s[0] == "line"]
    assert len(lines) == 4               # the outer square


def test_outer_loop_boundary_lines_and_interior_spline():
    """A solid band with a notch: boundary-touching segments are straight
    lines, the interior notch becomes a spline anchored at its boundary
    entry/exit points (abaqus_script.py:214-231)."""
    g = np.zeros((4, 4))
    g[3, :] = 1              # bottom band y in [0, 0.25]
    g[2, 1] = 1              # a bump
    plan = sketch_plan(g, splined=True, radius=0.0)
    splines = [s for s in plan["segments"] if s[0] == "spline"]
    assert len(splines) == 1
    anchors = splines[0][1]
    # spline anchored at the two boundary-run entry/exit corner points, both
    # at y=0.25 around the bump at x in [0.25, 0.5]
    assert anchors[0][1] == pytest.approx(0.25)
    assert anchors[-1][1] == pytest.approx(0.25)
    # everything on the domain boundary stayed a line
    for kind, p1, p2 in [s for s in plan["segments"] if s[0] == "line"]:
        mid = ((p1[0] + p2[0]) / 2, (p1[1] + p2[1]) / 2)
        on_boundary = (min(abs(mid[0]), abs(mid[0] - 1), abs(mid[1]),
                           abs(mid[1] - 1)) < 1e-9)
        interior_anchor_run = p1[1] == pytest.approx(0.25) \
            and p2[1] == pytest.approx(0.25)
        assert on_boundary or interior_anchor_run


def test_radius_rounding_square():
    g = np.zeros((4, 4))
    g[1, 1] = 1
    r = 0.05
    plan = sketch_plan(g, splined=False, radius=r)
    lines = [s for s in plan["segments"] if s[0] == "line"]
    arcs = [s for s in plan["segments"] if s[0] == "arc"]
    assert len(lines) == 4 and len(arcs) == 4
    # each line is shortened by r at both ends: length 0.25 - 2r
    for _, p1, p2 in lines:
        assert np.hypot(p2[0] - p1[0], p2[1] - p1[1]) == \
            pytest.approx(0.25 - 2 * r)
    # arc centers sit at distance r from both adjacent edges
    for _, center, _cw, p1, p2 in arcs:
        assert np.hypot(p1[0] - center[0], p1[1] - center[1]) == \
            pytest.approx(r)
        assert np.hypot(p2[0] - center[0], p2[1] - center[1]) == \
            pytest.approx(r)


def test_radius_too_large_raises():
    g = np.zeros((4, 4))
    g[1, 1] = 1
    with pytest.raises(ValueError, match="Radius too large"):
        sketch_plan(g, splined=False, radius=0.2)   # > half edge (0.125)


def test_probe_classification():
    g = np.zeros((2, 2))
    g[:, :] = 1              # fully solid cell
    plan = sketch_plan(g, splined=False, radius=0.0)
    assert len(plan["top_probes"]) == 1
    assert plan["top_probes"][0][1] == pytest.approx(1.0)
    assert len(plan["bot_probes"]) == 1
    assert plan["bot_probes"][0][1] == pytest.approx(0.0)
    # left/right edges are neither top nor bottom -> outer list
    assert len(plan["outer_probes"]) == 2


def test_bounding_box_and_mirror():
    g = np.zeros((4, 4))
    g[1, 1] = 1
    b = apply_bounding_box(g)
    assert b[0].all() and b[-1].all() and b[:, 0].all() and b[:, -1].all()
    assert b[1, 1] == 1 and b[1, 2] == 0
    m = mirror_periodic(g)
    assert m.shape == (8, 8)
    # 2-fold mirror symmetry
    np.testing.assert_array_equal(m, np.flip(m, 0))
    np.testing.assert_array_equal(m, np.flip(m, 1))


def test_plan_matches_previous_builder_on_grf():
    """Lines mode reproduces closed pixel-boundary loops on a random GRF
    geometry (regression of the loop walker)."""
    from videometamaterials_tpu.fem.grf import generate_geometry

    g = generate_geometry(6, 12, 0.1, 0.5,
                          rng=np.random.default_rng(0)).reshape(12, 12)
    loops = trace_pixel_loops(g)
    assert loops, "GRF geometry must have at least one boundary loop"
    for lp in loops:
        np.testing.assert_allclose(lp[0], lp[-1])
        steps = np.diff(lp, axis=0)
        # edge-by-edge: each step is one pixel edge, axis-aligned
        assert np.all(np.isclose(np.abs(steps).sum(axis=1), 1.0 / 12))