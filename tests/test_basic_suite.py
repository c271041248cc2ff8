"""Basic-geometry suite ported from the reference sparse corpus
(``vello_sparse_tests/tests/basic.rs``) — the cases our other suites don't
already cover: inverted (x0>x1) rects, sub-pixel hairline rects, a
strip-inscribed translucent bar, viewport-overflowing star fill+stroke,
aliased ("centers") rendering, path-space vs transform-space stroke
widths, implicit subpath restarts after close, and the left-edge culling
family (geometry fully/partially left of the viewport, under rotation and
clips — the cases that break left-edge winding corrections). Device
output diffs against the scanline oracle and own goldens."""

import math

import numpy as np
import pytest

from snapshot import assert_snapshot
from test_clip_suite import crossed_line_star
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import BezPath, Stroke, rect_path, star_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import ColorStop, Gradient, palette


def _check(name, scene, w=100, h=100, mean_tol=0.003, max_tol=None,
           aa="area", allow_flips=0):
    params = RenderParams(w, h, base_color=(0, 0, 0, 0), antialiasing=aa)
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    if aa == "area":
        assert np.abs(dev - orc).mean() < mean_tol, \
            f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol,
                    allow_flips=allow_flips)
    return dev


# basic.rs:191-228 — inverted rects (x0 > x1, y0 > y1) fill identically
def test_filled_inverted_rect():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(80.0, 80.0, 20.0, 20.0))
    dev = _check("basic_inverted_rect", s)
    assert float(dev[50, 50, 3]) > 0.99
    assert float(np.abs(dev[10, 10]).max()) < 1e-6


def test_filled_inverted_rect_gradient():
    g = Gradient.linear((20.0, 20.0), (80.0, 20.0), (
        ColorStop(0.0, palette.GREEN), ColorStop(1.0, palette.BLUE)))
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           rect_path(80.0, 80.0, 20.0, 20.0))
    dev = _check("basic_inverted_rect_gradient", s)
    # gradient orientation unaffected by rect inversion: green at left
    assert float(dev[50, 25, 1]) > float(dev[50, 25, 2])
    assert float(dev[50, 75, 2]) > float(dev[50, 75, 1])


def test_filled_inverted_rect_rotated():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.rotate_about(math.radians(45.0), 50., 50.),
           palette.REBECCA_PURPLE, None, rect_path(80.0, 80.0, 20.0, 20.0))
    _check("basic_inverted_rect_rotated", s)


# basic.rs:406-429 — strip-inscribed and hairline rects (sub-pixel widths)
def test_strip_inscribed_rect():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.REBECCA_PURPLE.with_alpha(0.5), None,
           rect_path(1.5, 9.5, 28.5, 11.5))
    _check("basic_strip_inscribed_rect", s, w=30, h=20)


def test_filled_vertical_hairline_rect():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.REBECCA_PURPLE.with_alpha(0.5), None,
           rect_path(2.25, 0.0, 2.75, 8.0))
    dev = _check("basic_hairline_rect", s, w=5, h=8)
    # half-pixel-wide at 0.5 alpha: ~0.25 total coverage in column 2
    assert 0.1 < float(dev[4, 2, 3]) < 0.4


def test_filled_vertical_hairline_rect_2():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.REBECCA_PURPLE.with_alpha(0.5), None,
           rect_path(4.5, 0.5, 5.5, 9.5))
    _check("basic_hairline_rect_2", s, w=10, h=10)


# basic.rs:431-446 — star bigger than the viewport, filled then stroked
def test_oversized_star():
    p = star_path(50.0, 50.0, 10, 30.0, 90.0)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None, p)
    s.stroke(Stroke(width=2.0), Affine.identity(), palette.DARK_BLUE,
             None, p)
    _check("basic_oversized_star", s)


# basic.rs:447-471 — aliased rendering ("centers" = the aliasing-threshold
# analog: binary per-pixel coverage)
def test_no_anti_aliasing():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.rotate_about(math.radians(45.0), 50., 50.),
           palette.REBECCA_PURPLE.with_alpha(0.5), None,
           rect_path(30.0, 30.0, 70.0, 70.0))
    # aliased mode: boundary jitter flips WHOLE pixels; gate the flip
    # count instead of amplitude (semantic binary-coverage assert below)
    dev = _check("basic_no_aa", s, aa="centers", allow_flips=8)
    # every pixel is either empty or exactly 0.5-alpha purple — no
    # fractional AA coverage anywhere
    a = np.asarray(dev[..., 3])
    frac = (a > 0.01) & (a < 0.49)
    assert int(frac.sum()) == 0


def test_no_anti_aliasing_clip_path():
    s = Scene()
    s.push_clip_layer(Affine.identity(), crossed_line_star())
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    dev = _check("basic_no_aa_clip", s, aa="centers", allow_flips=8)
    a = np.asarray(dev[..., 3])
    frac = (a > 0.01) & (a < 0.99)
    assert int(frac.sum()) == 0


# basic.rs:473-493 — stroke width lives in path space: a width-10 stroke
# of a 100x-scaled path must cover a width-0.1 stroke UNDER a 100x
# transform
def test_stroke_scaled():
    p = BezPath()
    p.move_to(0.0, 0.0)
    p.curve_to(0.25, 1.0, 0.75, 1.0, 1.0, 0.0)
    big = p.transform(Affine.scale(100.0))
    s = Scene()
    s.stroke(Stroke(width=10.0), Affine.identity(), palette.RED, None, big)
    s.stroke(Stroke(width=0.1), Affine.scale(100.0), palette.LIME, None, p)
    # two independently-expanded strokes overlap along the full length;
    # their AA boundaries quantize independently (measured 4/255 today)
    dev = _check("basic_stroke_scaled", s, mean_tol=0.02, max_tol=0.025)
    # width 0.1 under scale(100) == device width 10: the lime stroke must
    # "more or less completely cover" the red one (same centerline+width)
    lime = np.asarray(dev[..., 1]) > 0.5
    red = (np.asarray(dev[..., 0]) > 0.5) & ~lime
    assert lime.sum() > 800          # a ~10-px band across 100 px
    assert red.sum() < 0.05 * lime.sum()


# basic.rs:495-522 — subpaths without MoveTo after ClosePath restart at
# the previous subpath's start; trailing open subpaths close implicitly
def test_implicit_subpaths():
    p = BezPath()
    p.move_to(15.0, 5.0)
    p.line_to(25.0, 5.0)
    p.line_to(25.0, 15.0)
    p.close()
    p.line_to(15.0, 15.0)     # restarts at (15, 5) implicitly
    p.line_to(5.0, 15.0)
    p.move_to(5.0, 18.0)
    p.line_to(25.0, 18.0)
    p.line_to(25.0, 28.0)     # left open: closes implicitly
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None, p)
    dev = _check("basic_implicit_subpaths", s, w=30, h=30)
    assert float(dev[8, 22, 1]) > 0.9       # first (closed) triangle
    assert float(dev[12, 14, 1]) > 0.9      # second (implicit) subpath
    assert float(dev[24, 22, 1]) > 0.9      # third (implicitly closed)


# basic.rs:626-696 — the left-edge culling family: geometry fully or
# partially left of the viewport must still contribute correct winding
def test_left_cull_fully_left_combined():
    s = Scene()
    s.fill(Fill.NON_ZERO,
           Affine.rotate_about(math.radians(15.0), -25.0, 5.0),
           palette.REBECCA_PURPLE, None,
           rect_path(-40.0, -10.0, -10.0, 20.0))
    s.fill(Fill.NON_ZERO,
           Affine.rotate_about(math.radians(-15.0), -25.0, 55.0),
           palette.REBECCA_PURPLE, None,
           rect_path(-40.0, 40.0, -10.0, 70.0))
    dev = _check("basic_left_cull_fully_left", s, w=30, h=60)
    # everything is left of the viewport except tiny rotated slivers
    assert float(np.abs(dev[:, 10:]).max()) < 1e-6


def test_left_cull_cross_left_combined():
    s = Scene()
    for (rect, deg, cy) in [((-15.0, -15.0, 15.0, 15.0), 10.0, 0.0),
                            ((-20.0, 35.0, 20.0, 55.0), 5.0, 45.0),
                            ((-15.0, 75.0, 15.0, 105.0), -10.0, 90.0)]:
        s.fill(Fill.NON_ZERO,
               Affine.rotate_about(math.radians(deg), 0.0, cy),
               palette.REBECCA_PURPLE, None, rect_path(*rect))
    _check("basic_left_cull_cross_left", s, w=30, h=100)


def test_left_cull_triangle_expands_below_viewport():
    p = BezPath()
    p.move_to(15.0, 2.0)
    p.line_to(52.0, 72.0)
    p.line_to(-22.0, 72.0)
    p.close()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None, p)
    dev = _check("basic_left_cull_triangle_below", s, w=30, h=60)
    assert float(dev[55, 15, 3]) > 0.99


def test_left_cull_encloses_viewport():
    s = Scene()
    s.fill(Fill.NON_ZERO,
           Affine.rotate_about(math.radians(7.0), 15.0, 15.0),
           palette.REBECCA_PURPLE, None,
           rect_path(-50.0, -50.0, 80.0, 80.0))
    dev = _check("basic_left_cull_encloses", s, w=30, h=30)
    assert float(dev[..., 3].min()) > 0.99      # fully covered


def test_left_cull_mask_cross_combined():
    t = Affine((0.9848077, 0.17364818, -0.17364818, 0.9848077, 0.0, 0.0))
    mask = BezPath()
    for pts in ([(-10.0, -10.0), (15.0, -10.0), (20.0, 25.0), (-15.0, 25.0)],
                [(-2.4334785, 31.524632), (12.338636, 34.129355),
                 (6.0873017, 69.58243), (-8.6848135, 66.97771)],
                [(-15.0, 75.0), (20.0, 75.0), (15.0, 115.0), (-10.0, 115.0)]):
        mask.move_to(*pts[0])
        for q in pts[1:]:
            mask.line_to(*q)
        mask.close()
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(0.0, 0.0, 30.0, 100.0))
    s.push_clip_layer(Affine.identity(), mask)
    s.fill(Fill.NON_ZERO, t, palette.GREEN, None,
           rect_path(0.0, 0.0, 30.0, 100.0))
    s.pop_layer()
    s.pop_layer()
    _check("basic_left_cull_mask_cross", s, w=30, h=100)


def test_left_cull_mask_encloses_viewport():
    t = Affine((0.9848077, 0.17364818, -0.17364818, 0.9848077, 0.0, 0.0))
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(0.0, 0.0, 30.0, 30.0))
    s.push_clip_layer(Affine.identity(),
                      rect_path(-40.0, -40.0, 70.0, 70.0))
    s.fill(Fill.NON_ZERO, t, palette.GREEN, None,
           rect_path(-20.0, -20.0, 50.0, 50.0))
    s.pop_layer()
    s.pop_layer()
    dev = _check("basic_left_cull_mask_encloses", s, w=30, h=30)
    assert float(dev[..., 3].min()) > 0.99
