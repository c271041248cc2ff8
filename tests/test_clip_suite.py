"""Clip suite ported from the reference's sparse snapshot corpus
(``vello_sparse_tests/tests/clip.rs``): fill-rule clips, deeply nested
clip stacks, clip/transform interaction orders, save/restore semantics,
gradient content under clips, and viewport-exceeding clip culling.
Scenes re-authored against our Scene API; device output diffs against the
independent scanline oracle and own goldens.

Isolated (push_clip_layer) and non-isolated (push_clip_path) reference
variants render identically for plain src-over content; our clip-chain
collapse (pipeline/layered.py) IS the non-isolated formulation, so both
reference flavors are covered by the same scenes here and the collapse is
exercised by construction (single-draw simple clips become coverage
multipliers — including the conflation behavior clip.rs:411-421 documents).
"""

import math

import numpy as np
import pytest

from snapshot import assert_snapshot
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import BezPath, Stroke, circle_path, rect_path, star_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import ColorStop, Gradient, palette


def _check(name, scene, w=100, h=100, base=(0, 0, 0, 0), mean_tol=0.003,
           max_tol=None, oracle=True):
    params = RenderParams(w, h, base_color=base)
    dev = Renderer().render(scene, params)
    if oracle:
        orc = OracleRenderer().render(scene, params)
        assert np.abs(dev - orc).mean() < mean_tol, \
            f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol)
    return dev


def crossed_line_star() -> BezPath:
    """Self-intersecting 5-line star (clip.rs util crossed_line_star)."""
    p = BezPath()
    p.move_to(50.0, 10.0)
    p.line_to(75.0, 90.0)
    p.line_to(10.0, 40.0)
    p.line_to(90.0, 40.0)
    p.line_to(25.0, 90.0)
    p.line_to(50.0, 10.0)
    return p


def _outline(scene, path, transform=None):
    scene.stroke(Stroke(width=1.0), transform or Affine.identity(),
                 palette.DARK_BLUE, None, path)


GREEN_BLUE = (ColorStop(0.0, palette.GREEN), ColorStop(1.0, palette.BLUE))


# clip.rs:21-40
def test_clip_triangle_with_star():
    tri = BezPath()
    tri.move_to(10.0, 10.0)
    tri.line_to(90.0, 20.0)
    tri.line_to(20.0, 90.0)
    tri.close()
    s = Scene()
    _outline(s, tri)
    star = star_path(50, 50, 13, 25.0, 45.0)
    s.push_clip_layer(Affine.identity(), star)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           tri)
    s.pop_layer()
    _check("clip_triangle_with_star", s)


# clip.rs:42-74 — self-intersecting star clip under both fill rules
@pytest.mark.parametrize("rule", [Fill.NON_ZERO, Fill.EVEN_ODD])
def test_clip_star_fill_rules(rule):
    s = Scene()
    s.push_clip_layer(Affine.identity(), crossed_line_star(), rule)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    nm = "nonzero" if rule == Fill.NON_ZERO else "evenodd"
    _check(f"clip_star_{nm}", s)


# clip.rs:76-118 — 20 nested circle clips each with content
def test_clip_deeply_nested_circles():
    colors = [palette.RED, palette.DARK_BLUE, palette.DARK_GREEN,
              palette.REBECCA_PURPLE, palette.BLACK, palette.BLUE,
              palette.GREEN, palette.RED, palette.DARK_BLUE,
              palette.DARK_GREEN]
    s = Scene()
    radius = 48.0
    n = 0
    for _ in range(2):
        for c in colors:
            clip = circle_path(50.0, 50.0, radius)
            _outline(s, clip)
            s.push_clip_layer(Affine.identity(), clip)
            s.fill(Fill.NON_ZERO, Affine.identity(), c, None,
                   rect_path(0, 0, 100, 100))
            radius -= 2.5
            n += 1
    for _ in range(n):
        s.pop_layer()
    _check("clip_deeply_nested_circles", s, mean_tol=0.004)


# clip.rs:120-147 — intersection of a rect clip and a circle clip
def test_clip_rectangle_and_circle():
    s = Scene()
    rect = rect_path(10, 30, 50, 70)
    circ = circle_path(65.0, 50.0, 30.0)
    _outline(s, rect)
    _outline(s, circ)
    s.push_clip_layer(Affine.identity(), rect)
    s.push_clip_layer(Affine.identity(), circ)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    s.pop_layer()
    _check("clip_rectangle_and_circle", s)


# clip.rs:149-194 — strip-aligned clip vs culled near-horizontal curves:
# the shape's top edge is outside the clip but inside its tile row, so its
# winding contribution must survive any clip-based culling
def test_clip_rect_cull_alignment():
    top_y, bot_y = 16.0, 48.0     # tile-aligned (TILE_H = 16)
    s = Scene()
    clip = rect_path(18.0, top_y + 2.0, 78.0, bot_y - 2.0)
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.DARK_GREEN.with_alpha(0.1), None, clip)
    p = BezPath()
    ty, by = top_y + 1.0, bot_y - 1.0
    p.move_to(30.0, by)
    p.line_to(30.0, ty)
    p.curve_to(45.0, ty - 0.5, 55.0, ty - 0.5, 70.0, ty)
    p.line_to(70.0, by)
    p.curve_to(55.0, by + 0.5, 45.0, by + 0.5, 30.0, by)
    s.push_clip_layer(Affine.identity(), clip)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None, p)
    s.pop_layer()
    _check("clip_rect_cull_alignment", s, w=100, h=60)


# clip.rs:196-295 — clip/transform interaction orders
def _transform_case(name, clip_tf, clip_rect, fill_tf, fill_rect,
                    extra=None):
    s = Scene()
    clip = rect_path(*clip_rect)
    _outline(s, clip, clip_tf)
    s.push_clip_layer(clip_tf, clip)
    if extra is not None:
        extra(s)
    s.fill(Fill.NON_ZERO, fill_tf, palette.REBECCA_PURPLE, None,
           rect_path(*fill_rect))
    s.pop_layer()
    _check(name, s)


def test_clip_with_translation():
    tf = Affine.translate(30.0, 30.0)
    _transform_case("clip_with_translation", tf, (0, 0, 40, 40),
                    tf, (0, 0, 100, 100))


def test_clip_with_scale():
    tf = Affine.scale(2.0, 2.0)
    _transform_case("clip_with_scale", tf, (10, 10, 40, 40),
                    tf, (0, 0, 100, 100))


def test_clip_with_rotate():
    tf = Affine.rotate_about(45.0 * math.pi / 180.0, 50.0, 50.0)
    _transform_case("clip_with_rotate", tf, (20, 20, 80, 80),
                    tf, (20, 20, 80, 80))


def test_clip_transformed_rect():
    # identity clip, rotated content
    tf = Affine.rotate_about(45.0 * math.pi / 180.0, 50.0, 50.0)
    _transform_case("clip_transformed_rect", Affine.identity(),
                    (20, 20, 80, 80), tf, (20, 20, 80, 80))


def test_clip_with_multiple_transforms():
    rot = Affine.rotate_about(45.0 * math.pi / 180.0, 50.0, 50.0)
    scale = Affine.scale(1.5, 1.5)
    s = Scene()
    clip1 = rect_path(20, 20, 80, 80)
    _outline(s, clip1, rot)
    s.push_clip_layer(rot, clip1)
    clip2 = rect_path(30, 30, 70, 70)
    _outline(s, clip2, scale)
    s.push_clip_layer(scale, clip2)
    s.fill(Fill.NON_ZERO, scale, palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    s.pop_layer()
    _check("clip_with_multiple_transforms", s)


# clip.rs:297-324 — draw, pop the inner clip, draw again
def test_clip_with_save_restore():
    s = Scene()
    rect = rect_path(10, 30, 50, 70)
    circ = circle_path(65.0, 50.0, 30.0)
    _outline(s, rect)
    s.push_clip_layer(Affine.identity(), rect)
    _outline(s, circ)
    s.push_clip_layer(Affine.identity(), circ)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.DARK_GREEN.with_alpha(0.5), None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    _check("clip_with_save_restore", s)


# clip.rs:326-335 — translucent fill through an AA clip edge: body 50%
# black, AA border 25% (coverage x alpha)
def test_clip_with_opacity():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(10.5, 10.5, 89.5, 89.5))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLACK.with_alpha(0.5),
           None, rect_path(0, 0, 100, 100))
    s.pop_layer()
    dev = _check("clip_with_opacity", s, base=(1, 1, 1, 1))
    # interior pixel: 0.5 black over white = 0.5 gray
    assert abs(float(dev[50, 50, 0]) - 0.5) < 0.02
    # the AA border row sits at ~75% (white showing through 25% coverage)
    assert abs(float(dev[10, 50, 0]) - 0.75) < 0.04


# clip.rs:344-350 (issue #917) — clip rect wider than the viewport
def test_clip_exceeding_viewport():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(0, 0, 500, 10))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    dev = _check("clip_exceeding_viewport", s)
    assert float(dev[5, 50, 3]) > 0.9       # inside the clip band
    assert float(dev[50, 50, 3]) < 1e-3     # below it: fully clipped


# clip.rs:352-362 — content entirely outside the canvas under a clip
def test_clip_content_outside_canvas():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(0, 0, 16, 16))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(16, -16, 32, 0))
    s.pop_layer()
    params = RenderParams(16, 16, base_color=(0, 0, 0, 0))
    dev = Renderer().render(s, params)
    assert float(np.abs(dev).max()) < 1e-6


# clip.rs:411-421 — clipping a shape with ITSELF: the AA edge conflates
# (coverage^2 = 25% instead of 50%), exactly like the reference documents
def test_clip_self_conflation():
    rect = rect_path(10.5, 10.5, 89.5, 89.5)
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLUE, None, rect)
    s.pop_layer()
    dev = _check("clip_self_conflation", s)
    assert abs(float(dev[10, 50, 3]) - 0.25) < 0.04
    assert float(dev[50, 50, 3]) > 0.99


# clip.rs:423-433 — even-odd star as a non-isolated clip
def test_clip_star_evenodd_collapsed():
    s = Scene()
    s.push_clip_layer(Affine.identity(), crossed_line_star(), Fill.EVEN_ODD)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    _check("clip_star_evenodd_collapsed", s)


# clip.rs:479-564 — gradient-filled content under a 10px-border clip
def _gradient_clip_case(name, gradient):
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLACK, None,
           rect_path(0, 0, 600, 200))
    s.push_clip_layer(Affine.identity(), rect_path(10, 10, 590, 190))
    s.fill(Fill.NON_ZERO, Affine.identity(), gradient, None,
           rect_path(0, 0, 600, 200))
    s.pop_layer()
    _check(name, s, w=600, h=200)


def test_clip_with_linear_gradient_fill():
    _gradient_clip_case(
        "clip_with_linear_gradient_fill",
        Gradient.linear((100.0, 100.0), (300.0, 100.0), GREEN_BLUE))


def test_clip_with_radial_gradient_fill():
    _gradient_clip_case(
        "clip_with_radial_gradient_fill",
        Gradient.radial((300.0, 100.0), 150.0, GREEN_BLUE))


def test_clip_with_sweep_gradient_fill():
    _gradient_clip_case(
        "clip_with_sweep_gradient_fill",
        Gradient.sweep((300.0, 100.0), 0.0, 2.0 * math.pi, GREEN_BLUE))


# clip.rs:566-574 — clip rect starting left of the viewport (left-cull path)
def test_clip_encloses_viewport_via_left_cull():
    s = Scene()
    s.push_clip_layer(Affine.identity(),
                      rect_path(-100.0, -100.0, 400.0, 130.0))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 300, 30))
    s.pop_layer()
    dev = _check("clip_left_cull", s, w=300, h=30)
    pp = palette.REBECCA_PURPLE
    assert np.allclose(dev[15, 150, :3], [pp.r * 1, pp.g, pp.b], atol=0.01)
