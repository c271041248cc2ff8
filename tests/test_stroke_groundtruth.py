"""Stroke correctness vs an INDEPENDENT distance-field ground truth.

A stroke with round caps and round joins is exactly the set of points
within half-width of the centerline curve. This rasterizes that set
directly — dense exact-Bezier sampling + supersampled distance tests,
never touching expand_stroke / flatten — and diffs the device renderer
against it. This closes the oracle blind spot flagged in round 1 (oracle
and device share the stroke expansion, so expansion bugs were invisible).

Reference behavior under test: kurbo::stroke via vello/src/scene.rs:386-439
and the offset-tolerance guarantees of flatten.wgsl:328-630.
"""

import math

import numpy as np
import pytest

from vello_tpu import Affine, Fill, RenderParams, Scene, Stroke
from vello_tpu.kurbo import BezPath
from vello_tpu.models.renderer import Renderer
from vello_tpu.peniko import palette

SS = 4  # supersamples per axis


def _sample_bezier_dense(path: BezPath, n_per_seg=2048):
    """Dense point sampling of the exact curves (f64)."""
    pts = []
    cur = start = None
    from vello_tpu.kurbo import CLOSE, CURVE_TO, LINE_TO, MOVE_TO, QUAD_TO
    for sub in path.subpaths():
        for verb, vp in sub:
            t = np.linspace(0.0, 1.0, n_per_seg)[:, None]
            if verb == MOVE_TO:
                cur = start = np.asarray(vp[0], float)
            elif verb == LINE_TO:
                p = np.asarray(vp[0], float)
                pts.append(cur * (1 - t) + p * t)
                cur = p
            elif verb == QUAD_TO:
                c, p = np.asarray(vp[0], float), np.asarray(vp[1], float)
                pts.append((1 - t) ** 2 * cur + 2 * (1 - t) * t * c
                           + t ** 2 * p)
                cur = p
            elif verb == CURVE_TO:
                c1, c2, p = (np.asarray(v, float) for v in vp)
                pts.append((1 - t) ** 3 * cur + 3 * (1 - t) ** 2 * t * c1
                           + 3 * (1 - t) * t ** 2 * c2 + t ** 3 * p)
                cur = p
            elif verb == CLOSE:
                pts.append(cur * (1 - t) + start * t)
                cur = start
    return np.concatenate(pts) if pts else np.zeros((0, 2))


def _distance_field_stroke(path: BezPath, width: float, w: int, h: int):
    """Supersampled coverage of {dist(p, centerline) <= width/2}."""
    pts = _sample_bezier_dense(path)
    hw = width / 2.0
    ys, xs = np.mgrid[0:h * SS, 0:w * SS]
    sx = (xs + 0.5) / SS
    sy = (ys + 0.5) / SS
    from scipy.spatial import cKDTree
    flat = np.stack([sx.ravel(), sy.ravel()], axis=-1)
    d, _ = cKDTree(pts).query(flat, workers=-1)
    inside = d <= hw
    cov = inside.reshape(h, SS, w, SS).mean(axis=(1, 3))
    return cov.astype(np.float64)


CASES = {
    # tight curvature: offset tolerance matters (centerline-only flattening
    # visibly faceted here before the offset-aware subdivision)
    "tight_curve": (
        BezPath().move_to(8, 40).curve_to(30, 4, 34, 4, 56, 40), 10.0),
    # cusp-ish loop cubic
    "loop": (
        BezPath().move_to(10, 45).curve_to(60, -10, 4, -10, 54, 45), 8.0),
    # polyline with segment shorter than the half-width (inner-join case)
    "short_segment": (
        BezPath().move_to(8, 20).line_to(32, 22).line_to(34, 21)
        .line_to(56, 44), 12.0),
    # quad
    "quad": (BezPath().move_to(6, 50).quad_to(32, -20, 58, 50), 9.0),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_stroke_matches_distance_field(name):
    path, width = CASES[name]
    w = h = 64
    s = Scene()
    s.stroke(Stroke(width=width, join="round", start_cap="round",
                    end_cap="round"),
             Affine.identity(), palette.WHITE, None, path)
    img = Renderer().render(s, RenderParams(w, h))
    got = np.asarray(img[..., 0], dtype=np.float64)
    want = _distance_field_stroke(path, width, w, h)
    d = np.abs(got - want)
    # mean over the frame small; max bounded by AA-model differences at
    # the boundary (distance field vs exact-area coverage of the outline)
    assert d.mean() < 4e-3, f"{name}: mean {d.mean():.5f}"
    assert (d > 0.5).mean() < 2e-3, \
        f"{name}: {100 * (d > 0.5).mean():.2f}% pixels off by >0.5"
