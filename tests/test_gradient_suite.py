"""Gradient edge-case suite ported from the reference's sparse snapshot
corpus (``vello_sparse_tests/tests/gradient.rs``, 1092 LoC): spread methods
(pad/repeat/reflect) for all three kinds, brush transforms (translate /
scale / negative scale / rotate / non-uniform scale / skew), padded and
alpha stops, offset radial centers, non-overlapping radial circle pairs
(the focal-form kinds), and off-center sweeps. Scenes are re-authored
against our Scene API; device output diffs against the independent
scanline oracle and own goldens."""

import math

import numpy as np
import pytest

from snapshot import assert_snapshot
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import BezPath, circle_path, rect_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import Color, ColorStop, Extend, Gradient, palette


def _check(name, scene, w=100, h=100, base=(0, 0, 0, 0), mean_tol=0.004,
           max_tol=None):
    params = RenderParams(w, h, base_color=base)
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    assert np.abs(dev - orc).mean() < mean_tol, \
        f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.005, max_tol=max_tol)


BLUE = Color(0.0, 0.0, 1.0)
GREEN = Color(0.0, 0.5, 0.0)
RED = Color(1.0, 0.0, 0.0)
YELLOW = Color(1.0, 1.0, 0.0)


def _s2():
    return [ColorStop(0.0, BLUE), ColorStop(1.0, GREEN)]


def _s4():
    return [ColorStop(0.0, BLUE), ColorStop(0.33, GREEN),
            ColorStop(0.66, RED), ColorStop(1.0, YELLOW)]


def _fill_rect(brush, brush_tf=None):
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), brush, brush_tf,
           rect_path(10, 10, 90, 90))
    return s


# --- linear: direction / stop structure (gradient.rs linear module) ------

@pytest.mark.parametrize("name,p0,p1", [
    ("grad_linear_horizontal", (10, 50), (90, 50)),
    ("grad_linear_vertical", (50, 10), (50, 90)),
    ("grad_linear_tan45", (10, 10), (90, 90)),
    ("grad_linear_negative_direction", (90, 50), (10, 50)),
    ("grad_linear_downward_y", (20, 20), (80, 80)),
    ("grad_linear_upward_y", (20, 80), (80, 20)),
])
def test_linear_directions(name, p0, p1):
    _check(name, _fill_rect(Gradient.linear(p0, p1, _s2())))


def test_linear_4_stops():
    _check("grad_linear_4_stops",
           _fill_rect(Gradient.linear((10, 50), (90, 50), _s4())))


def test_linear_stops_with_alpha():
    st = [ColorStop(0.0, Color(0, 0, 1, 0.25)),
          ColorStop(0.5, Color(0, 0.5, 0, 0.75)),
          ColorStop(1.0, Color(1, 0, 0, 1.0))]
    _check("grad_linear_alpha_stops",
           _fill_rect(Gradient.linear((10, 50), (90, 50), st)))


def test_linear_padded_stops():
    # first stop at 0.3, last at 0.7: pad regions on both sides
    st = [ColorStop(0.3, BLUE), ColorStop(0.7, GREEN)]
    _check("grad_linear_padded_stops",
           _fill_rect(Gradient.linear((10, 50), (90, 50), st)))


@pytest.mark.parametrize("ext", list(Extend))
def test_linear_spread_methods(ext):
    # short axis so the spread method tiles visibly (gradient.rs
    # gradient_linear_spread_method_*)
    g = Gradient.linear((40, 50), (60, 50), _s2(), extend=ext)
    _check(f"grad_linear_spread_{ext.name.lower()}", _fill_rect(g))


def test_linear_complex_shape():
    p = BezPath()
    p.move_to(50, 10)
    for k in range(1, 10):
        ang = k * math.pi / 5.0
        r = 40 if k % 2 == 0 else 18
        p.line_to(50 + r * math.sin(ang), 50 - r * math.cos(ang))
    p.close()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           Gradient.linear((10, 10), (90, 90), _s4()), None, p)
    _check("grad_linear_complex_shape", s)


# --- brush transforms (gradient.rs *_with_transform_*) -------------------

_TRANSFORMS = {
    "translate": Affine.translate(12, -6),
    "scale": Affine.scale(1.5),
    "negative_scale": Affine.translate(100, 100) @ Affine.scale(-1.0),
    "scale_nonuniform": Affine.scale(1.6, 0.6),
    "rotate": Affine.rotate_about(math.radians(30), 50, 50),
    "skew_x": Affine.skew(math.tan(math.radians(25)), 0.0),
    "skew_y": Affine.skew(0.0, math.tan(math.radians(25))),
}


@pytest.mark.parametrize("tname", sorted(_TRANSFORMS))
def test_linear_with_transform(tname):
    g = Gradient.linear((20, 20), (80, 80), _s4())
    _check(f"grad_linear_tf_{tname}",
           _fill_rect(g, _TRANSFORMS[tname]))


@pytest.mark.parametrize("tname", ["rotate", "skew_x", "scale_nonuniform"])
def test_radial_with_transform(tname):
    g = Gradient.radial((50, 50), 40.0, _s4())
    _check(f"grad_radial_tf_{tname}",
           _fill_rect(g, _TRANSFORMS[tname]))


@pytest.mark.parametrize("tname", ["rotate", "skew_y", "negative_scale"])
def test_sweep_with_transform(tname):
    g = Gradient.sweep((50, 50), 0.0, 2.0 * math.pi, _s4())
    _check(f"grad_sweep_tf_{tname}",
           _fill_rect(g, _TRANSFORMS[tname]))


# --- radial: centers, circle pairs, focal kinds (gradient.rs radial) -----

@pytest.mark.parametrize("ext", list(Extend))
def test_radial_spread_methods(ext):
    g = Gradient.radial((50, 50), 20.0, _s2(), extend=ext)
    _check(f"grad_radial_spread_{ext.name.lower()}", _fill_rect(g))


@pytest.mark.parametrize("name,c0", [
    ("grad_radial_center_top_left", (30, 30)),
    ("grad_radial_center_bottom_right", (70, 70)),
])
def test_radial_center_offset(name, c0):
    # focal point offset from the outer circle's center
    g = Gradient.radial((50, 50), 40.0, _s2(), center0=c0, radius0=0.0)
    _check(name, _fill_rect(g))


def test_radial_c0_bigger():
    # swapped: inner circle larger than outer (gradient_radial_c0_bigger)
    g = Gradient.radial((50, 50), 10.0, _s2(), center0=(50, 50),
                        radius0=40.0)
    _check("grad_radial_c0_bigger", _fill_rect(g))


@pytest.mark.parametrize("name,c0,r0,c1,r1", [
    # the focal-form kinds: disjoint circle pairs (strip / cone / focal)
    ("grad_radial_nonoverlap_same_size", (30, 50), 15.0, (70, 50), 15.0),
    ("grad_radial_nonoverlap_c0_smaller", (30, 50), 6.0, (72, 50), 20.0),
    ("grad_radial_nonoverlap_c0_larger", (30, 50), 20.0, (76, 50), 6.0),
    ("grad_radial_natively_focal", (42, 50), 0.0, (60, 50), 35.0),
])
def test_radial_circle_pairs(name, c0, r0, c1, r1):
    g = Gradient.radial(c1, r1, _s2(), center0=c0, radius0=r0,
                        extend=Extend.PAD)
    _check(name, _fill_rect(g), mean_tol=0.006)


def test_radial_smaller_r1_with_reflect():
    g = Gradient.radial((50, 50), 12.0, _s2(), center0=(50, 50),
                        radius0=28.0, extend=Extend.REFLECT)
    _check("grad_radial_smaller_r1_reflect", _fill_rect(g))


# --- sweep (gradient.rs sweep module) ------------------------------------

def test_sweep_2_stops():
    g = Gradient.sweep((50, 50), 0.0, 2.0 * math.pi, _s2())
    _check("grad_sweep_2_stops", _fill_rect(g))


def test_sweep_4_stops_partial_arc():
    # sweep over a partial arc: pad fills the rest
    g = Gradient.sweep((50, 50), math.radians(30), math.radians(240),
                       _s4())
    _check("grad_sweep_partial_arc", _fill_rect(g))


@pytest.mark.parametrize("ext", list(Extend))
def test_sweep_spread_methods(ext):
    g = Gradient.sweep((50, 50), math.radians(-30), math.radians(90),
                       _s2(), extend=ext)
    _check(f"grad_sweep_spread_{ext.name.lower()}", _fill_rect(g))


def test_sweep_not_in_center():
    g = Gradient.sweep((25, 70), 0.0, 2.0 * math.pi, _s4())
    _check("grad_sweep_not_in_center", _fill_rect(g))


def test_sweep_complex_shape():
    s = Scene()
    s.fill(Fill.EVEN_ODD, Affine.identity(),
           Gradient.sweep((50, 50), 0.0, 2.0 * math.pi, _s4()), None,
           circle_path(50, 50, 42))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.WHITE, None,
           circle_path(50, 50, 8))
    _check("grad_sweep_complex_shape", s)
