"""Regression suite ported from the reference's GitHub-issue corpus
(``vello_sparse_tests/tests/issues.rs``): fill robustness at epsilon/
tile-boundary coordinates, unclosed subpaths, viewport-exceeding geometry,
clip-stack edge cases that used to panic, degenerate two-point radials
(WPT canvas cases), clear-compose layers, gradient alpha interpolation,
filter-layer ordering, image extend/caching, occlusion-vs-AA interaction,
and renderer-reuse staleness. Scenes re-authored against our Scene API;
device output diffs against the independent scanline oracle and own
goldens (no_ref reference tests assert behavior directly)."""

import numpy as np
import pytest

from snapshot import assert_snapshot
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import BezPath, Stroke, circle_path, rect_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import (BlendMode, Color, ColorStop, Compose, Extend,
                              Gradient, Image, ImageQuality, Mix, palette)
from vello_tpu.utils.svg import parse_path_data


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


def _poly(pts, close=True):
    p = BezPath()
    p.move_to(*pts[0])
    for q in pts[1:]:
        p.line_to(*q)
    if close:
        p.close()
    return p


# issues.rs:29-151 (cpu-sparse-experiments#2) — fill correctness at exact
# tile boundaries and float-epsilon offsets; each historically produced
# dropped or doubled winding rows.
@pytest.mark.parametrize("name,size,pts", [
    ("incorrect_filling_1", 8,
     [(4.0, 0.0), (8.0, 4.0), (4.0, 8.0), (0.0, 4.0)]),
    ("incorrect_filling_2", 64,
     [(16.0, 16.0), (48.0, 16.0), (48.0, 48.0), (16.0, 48.0)]),
    ("incorrect_filling_3", 9,
     [(4.00001, 1e-45), (8.00001, 4.00001), (4.00001, 8.00001),
      (1e-45, 4.00001)]),
    ("incorrect_filling_4", 64,
     [(16.000002, 8.), (20.000002, 8.), (24.000002, 8.), (28.000002, 8.),
      (32.000002, 8.), (32.000002, 9.), (28.000002, 9.), (24.000002, 9.),
      (20.000002, 9.), (16.000002, 9.)]),
    ("incorrect_filling_5", 32,
     [(16., 8.), (16., 9.), (32., 9.), (32., 8.)]),
    ("incorrect_filling_6", 32,
     [(16., 8.), (31.999998, 8.), (31.999998, 9.), (16., 9.)]),
    ("incorrect_filling_7", 32,
     [(32.000002, 9.), (28., 9.), (28., 8.), (32.000002, 8.)]),
    ("incorrect_filling_8", 32,
     [(16.000427, 8.), (20.000427, 8.), (24.000427, 8.), (28.000427, 8.),
      (32.000427, 8.), (32.000427, 9.), (28.000427, 9.), (24.000427, 9.),
      (20.000427, 9.), (16.000427, 9.)]),
])
def test_incorrect_filling(name, size, pts):
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None, _poly(pts))
    _check(name, s, w=size, h=size)


# issues.rs:153-165 — stroke entirely right of the viewport must not crash
# and must paint nothing (out-of-bound strip culling)
def test_out_of_bound_strip():
    p = BezPath()
    p.move_to(258.0, 254.0)
    p.line_to(265.0, 254.0)
    s = Scene()
    s.stroke(Stroke(width=1.0), Affine.identity(), palette.DARK_BLUE, None, p)
    img = Renderer().render(s, RenderParams(256, 256, base_color=(0, 0, 0, 0)))
    assert float(np.abs(np.asarray(img)).max()) < 1e-6


# issues.rs:167-195 — unclosed subpaths are implicitly closed for fills
def test_filling_unclosed_path_1():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None,
           _poly([(75.0, 25.0), (25.0, 25.0), (25.0, 75.0)], close=False))
    _check("issue_filling_unclosed_path_1", s)


def test_filling_unclosed_path_2():
    p = BezPath()
    p.move_to(50.0, 0.0)
    p.line_to(0.0, 0.0)
    p.line_to(0.0, 50.0)
    p.move_to(50.0, 50.0)
    p.line_to(100.0, 50.0)
    p.line_to(100.0, 100.0)
    p.line_to(50.0, 100.0)
    p.close()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None, p)
    _check("issue_filling_unclosed_path_2", s)


# issues.rs:197-223 — even-odd triangles overhanging the viewport edges
@pytest.mark.parametrize("name,pts", [
    ("triangle_exceeding_viewport_1",
     [(5.0, 0.0), (12.0, 7.99), (-4.0, 7.99)]),
    ("triangle_exceeding_viewport_2",
     [(4.0, 0.0), (11.0, 7.99), (-5.0, 7.99)]),
])
def test_triangle_exceeding_viewport(name, pts):
    s = Scene()
    s.fill(Fill.EVEN_ODD, Affine.identity(), palette.LIME, None, _poly(pts))
    _check(name, s, w=15, h=8)


# issues.rs:225-237 — the self-intersecting bowtie must keep AA on the
# crossing diagonals under even-odd
def test_eo_filling_missing_anti_aliasing():
    s = Scene()
    s.fill(Fill.EVEN_ODD, Affine.identity(), palette.LIME, None,
           _poly([(0.0, 0.0), (50.0, 50.0), (0.0, 50.0), (50.0, 0.0)]))
    dev = _check("issue_eo_missing_aa", s, w=50, h=50)
    # center of the X crossing: diagonal edges pass through, coverage
    # must be fractional somewhere along the diagonal (AA present)
    band = dev[24:27, 24:27, 1]
    assert 0.02 < float(band.mean()) < 0.98


# issues.rs:239-246 (vello#906) — fill must respect the clip bbox
def test_fill_command_respects_clip_bounds():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(400, 400, 500, 500))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 600, 600))
    s.pop_layer()
    params = RenderParams(600, 600, base_color=(0, 0, 0, 0))
    dev = np.asarray(Renderer().render(s, params))
    assert float(np.abs(dev[:399, :399]).max()) < 1e-6
    assert float(dev[450, 450, 3]) > 0.99


# issues.rs:248-254 — clip wholly out of the viewport: nothing painted
def test_out_of_viewport_clip():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(-100, -100, 0, 0))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    img = Renderer().render(s, RenderParams(100, 100, base_color=(0, 0, 0, 0)))
    assert float(np.abs(np.asarray(img)).max()) < 1e-6


# issues.rs:256-287 (vello#1032/#1034/#1072) — nested-clip bbox
# intersections that used to panic (empty intersection, x0 > x1)
def test_nested_clip_path_no_panic():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(256, 0, 257, 2))
    s.push_clip_layer(Affine.identity(), rect_path(181, -200, 760, 618))
    s.pop_layer()
    s.pop_layer()
    img = Renderer().render(s, RenderParams(300, 4, base_color=(0, 0, 0, 0)))
    assert img.shape == (4, 300, 4)


def test_nested_clip_path_no_panic_2():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(256, 0, 280, 2))
    s.push_clip_layer(Affine.identity(), rect_path(0, 0, 511, 4))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(0, 0, 511, 4))
    s.pop_layer()
    s.pop_layer()
    dev = _check("issue_nested_clip_2", s, w=512, h=4)
    assert float(dev[1, 260, 0]) > 0.9      # inside both clips
    assert float(np.abs(dev[1, 100]).max()) < 1e-6   # outside inner clip


def test_intersected_clip_bbox_with_x0_gt_x1():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(0, 0, 4, 4))
    s.push_clip_layer(Affine.identity(), rect_path(0, 8, 260, 16))
    s.pop_layer()
    s.pop_layer()
    img = Renderer().render(s, RenderParams(10, 16, base_color=(0, 0, 0, 0)))
    assert float(np.abs(np.asarray(img)).max()) < 1e-6


# issues.rs:289-333 (vello#1124, WPT 2d.gradient.radial.inside3/outside3)
# — two-point radials with r0 > r1 (shrinking cones)
def test_gradient_radial_inside():
    g = Gradient.radial((50., 25.), 100.0, (
        ColorStop(0.0, Color.from_rgba8(255, 0, 0)),
        ColorStop(0.993, Color.from_rgba8(255, 0, 0)),
        ColorStop(1.0, Color.from_rgba8(0, 255, 0))),
        center0=(50., 25.), radius0=200.0)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           rect_path(0, 0, 100, 50))
    dev = _check("issue_gradient_radial_inside", s, w=100, h=50)
    # canvas semantics: every viewport point lies on a circle with
    # omega > 1 (shrinking cone), so the offset-1 stop paints it — solid
    # GREEN everywhere (WPT tests are authored so green == pass)
    assert float(dev[..., 1].min()) > 0.95
    assert float(dev[..., 0].max()) < 0.05


def test_gradient_radial_outside():
    g = Gradient.radial((200., 25.), 10.0, (
        ColorStop(0.0, Color.from_rgba8(0, 255, 0)),
        ColorStop(0.001, Color.from_rgba8(255, 0, 0)),
        ColorStop(1.0, Color.from_rgba8(255, 0, 0))),
        center0=(200., 25.), radius0=20.0)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           rect_path(0, 0, 100, 50))
    dev = _check("issue_gradient_radial_outside", s, w=100, h=50)
    # every viewport point is on an omega < 0 circle -> offset-0 stop:
    # solid GREEN (see inside variant)
    assert float(dev[..., 1].min()) > 0.95
    assert float(dev[..., 0].max()) < 0.05


# issues.rs:345-373 (vello#1119) — an empty Clear-compose layer erases the
# clipped region
def test_clip_clear():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None,
           rect_path(0, 0, 100, 100))
    s.push_layer(BlendMode(Mix.NORMAL, Compose.CLEAR), 1.0,
                 Affine.identity(), rect_path(0, 0, 50, 50))
    s.pop_layer()
    dev = _check("issue_clip_clear", s)
    assert float(np.abs(dev[10, 10]).max()) < 1e-3   # cleared
    assert float(dev[75, 75, 1]) > 0.9               # untouched lime


def test_clip_clear_circle():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None,
           rect_path(0, 0, 100, 100))
    s.push_layer(BlendMode(Mix.NORMAL, Compose.CLEAR), 1.0,
                 Affine.identity(), circle_path(50.25, 49.75, 30.5))
    s.pop_layer()
    dev = _check("issue_clip_clear_circle", s)
    assert float(np.abs(dev[50, 50]).max()) < 1e-3
    assert float(dev[2, 2, 1]) > 0.9


# issues.rs:389-429 (vello#1056, WPT 2d.gradient.interpolate.coloralpha) —
# premultiplied vs unpremultiplied gradient alpha interpolation
def test_gradient_color_alpha():
    stops = (ColorStop(0.0, Color.from_rgba8(255, 255, 0, 0)),
             ColorStop(1.0, Color.from_rgba8(0, 0, 255, 255)))
    g = Gradient.linear((0., 0.), (100., 0.), stops)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None, rect_path(0, 0, 100, 50))
    _check("issue_gradient_color_alpha", s, w=100, h=50)


def test_gradient_color_alpha_unmul():
    import dataclasses
    stops = (ColorStop(0.0, Color.from_rgba8(255, 255, 0, 0)),
             ColorStop(1.0, Color.from_rgba8(0, 0, 255, 255)))
    g = dataclasses.replace(
        Gradient.linear((0., 0.), (100., 0.), stops),
        alpha_space="unpremultiplied")
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None, rect_path(0, 0, 100, 50))
    dev = _check("issue_gradient_color_alpha_unmul", s, w=100, h=50)
    # midpoint keeps the yellow hue at half alpha (straight-alpha lerp)
    mid = dev[25, 50]
    assert float(mid[0]) > 0.2          # red component present (yellowish)


# issues.rs:464-472 (vello#1181) — 556-wide layer: tile clamp off-by-one
def test_tile_clamped_off_by_one():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(0, 0, 556, 8))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLACK, None,
           rect_path(0, 0, 556, 8))
    s.pop_layer()
    dev = _check("issue_tile_clamped_off_by_one", s, w=556, h=8)
    assert float(dev[4, 550, 3]) > 0.99


# issues.rs:474-485 (vello#1186) — self-intersecting SVG clips under a
# large negative translate picked the wrong PTCL command
def test_clip_wrong_command():
    p1 = parse_path_data(
        "M551.704,721.115 C465.024,716.424 375.466,706.552 289.699,688.737 "
        "C290.316,688.60205 290.935,688.466 291.55,688.33 C377.059,705.978 "
        "466.259,715.75 552.629,720.39 C552.32,720.632 552.013,720.87305 "
        "551.704,721.115")
    p2 = parse_path_data(
        "M-133.795,680.40704 C390.292,801.45905 763.166,503.67102 "
        "666.575,258.86005 C1031.16,797.18604 -452.803,1197.37 "
        "-133.795,680.40704")
    t = Affine.translate(0.0, -700.0)
    s = Scene()
    s.push_clip_layer(t, p1)
    s.push_clip_layer(t, p2)
    s.fill(Fill.NON_ZERO, t, palette.BLACK, None, rect_path(0, 0, 595, 808))
    s.pop_layer()
    s.pop_layer()
    _check("issue_clip_wrong_command", s, w=595, h=20)


# issues.rs:487-494 (vello#1219)
def test_basic_alpha_compositing():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(10, 10, 70, 70))
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.REBECCA_PURPLE.with_alpha(0.9), None,
           rect_path(30, 30, 90, 90))
    _check("issue_basic_alpha_compositing", s)


# issues.rs:496-499 — u16::MAX-scale rect must not overflow tile math
def test_large_dimensions():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.NAVY, None,
           rect_path(0.0, 0.0, 65545.0, 8.0))
    img = np.asarray(Renderer().render(
        s, RenderParams(100, 100, base_color=(0, 0, 0, 0))))
    assert float(img[4, 50, 2]) > 0.4       # navy row covers the viewport
    assert float(np.abs(img[50, 50]).max()) < 1e-6


# issues.rs:501-547 (#1417) — zero-strip clip layers + no-op offset filter
# must stay push/pop symmetric across repeated frames
def test_issue_1417():
    s = Scene()
    for _ in range(2):
        s.push_offset_layer(0.0, 0.0, clip_path=rect_path(20, 20, 80, 80))
        s.push_layer(Mix.NORMAL, 1.0, Affine.identity(), None)
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.PURPLE, None,
               rect_path(20, 20, 80, 80))
        s.pop_layer()
        s.pop_layer()
        s.push_offset_layer(0.0, 0.0, clip_path=rect_path(100, 100, 104, 104))
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.ROYAL_BLUE, None,
               rect_path(100, 100, 104, 104))
        s.pop_layer()
    dev = _check("issue_1417", s)
    assert float(dev[50, 50, 0]) > 0.4      # purple visible


# issues.rs:549-558 (#1421) — flood filter respects the layer clip
def test_issue_1421():
    s = Scene()
    s.push_flood_layer(palette.TOMATO, clip_path=rect_path(15, 15, 85, 85))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(15, 15, 85, 85))
    s.pop_layer()
    dev = _check("issue_1421", s)
    assert float(np.abs(dev[5, 5]).max()) < 1e-3      # outside clip: empty
    assert float(dev[50, 50, 0]) > 0.9                # flooded tomato


# issues.rs:560-588 (#1433) — Pad extend of an image with a transparent
# bottom row must not bleed garbage
def test_issue_1433():
    data = np.zeros((4, 4, 4), dtype=np.uint8)
    data[:3, :, 0] = 255
    data[:3, :, 3] = 255
    img = Image(data=data, x_extend=Extend.PAD, y_extend=Extend.PAD,
                quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None, rect_path(0, 0, 4, 4))
    dev = _check("issue_1433", s, w=4, h=4)
    assert float(dev[1, 1, 0]) > 0.9
    assert float(np.abs(dev[3, 1]).max()) < 0.35      # transparent row


# issues.rs:590-629 (#1468) — many distinct tiny images; the LAST paint
# must win after heavy atlas/image-cache traffic
def test_issue_1468_many_images():
    s = Scene()
    for i in range(1200):
        val = i % 255 + 1
        data = np.full((1, 1, 4), 255, dtype=np.uint8)
        data[0, 0, :3] = val
        img = Image(data=data, quality=ImageQuality.LOW)
        s.fill(Fill.NON_ZERO, Affine.identity(), img, None,
               rect_path(0, 0, 1, 1))
    final = np.zeros((1, 1, 4), dtype=np.uint8)
    final[0, 0] = (255, 0, 0, 255)
    s.fill(Fill.NON_ZERO, Affine.identity(),
           Image(data=final, quality=ImageQuality.LOW), None,
           rect_path(0, 0, 10, 10))
    img_out = np.asarray(Renderer().render(
        s, RenderParams(10, 10, base_color=(0, 0, 0, 0))))
    assert float(img_out[..., 0].min()) > 0.9   # red everywhere (Pad extend)
    assert float(img_out[..., 1].max()) < 0.1


# issues.rs:631-643 (#1477) — draws AFTER a filtered layer stay on top
def test_issue_1477():
    s = Scene()
    s.push_offset_layer(0.0, 0.0)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(0, 0, 768, 4))
    s.pop_layer()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLACK, None,
           rect_path(0, 0, 768, 4))
    dev = _check("issue_1477", s, w=768, h=4)
    assert float(np.abs(dev[2, 400, :3]).max()) < 1e-3    # black on top


# issues.rs:645-659 — an opaque rect occluding the middle of one long AA
# strip must split the visible runs without eating the AA tails
def test_opaque_rect_partially_occluding_aa_edge():
    tri = _poly([(0.0, 8.0), (512.0, 12.0), (0.0, 12.0)])
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.DARK_BLUE, None, tri)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(96.0, 8.0, 416.0, 12.0))
    dev = _check("issue_opaque_rect_occluding_aa", s, w=512, h=16)
    assert float(dev[10, 200, 0]) > 0.95          # red interior
    assert float(dev[11, 50, 2]) > 0.4            # left AA run: blue
    # right AA run: hypotenuse y(480) = 11.75, so row 11 coverage is
    # ~0.25 of dark blue (139/255) — present but fractional
    assert float(dev[11, 480, 2]) > 0.1


# issues.rs:679-689 — SoftLight blend over alpha fills keeps AA
def test_flush_fast_path_with_blending():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLUE.with_alpha(0.5),
           None, rect_path(10.5, 10.5, 70.5, 70.5))
    s.push_layer(BlendMode(Mix.SOFT_LIGHT, Compose.SRC_OVER), 1.0,
                 Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME.with_alpha(0.5),
           None, rect_path(30.5, 30.5, 90.5, 90.5))
    s.pop_layer()
    _check("issue_softlight_alpha", s)


# issues.rs:691-698 — rect fully below the viewport
def test_rect_at_bottom_of_viewport():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.NAVY, None,
           rect_path(25.0, 101.0, 200.0, 130.0))
    img = Renderer().render(s, RenderParams(100, 100, base_color=(0, 0, 0, 0)))
    assert float(np.abs(np.asarray(img)).max()) < 1e-6


# issues.rs:700-759 (#1528) — gradients with undefined locations must not
# poison a shared ramp cache entry
def test_issue_1528_gradient_cache():
    stops4 = (ColorStop(0.0, palette.BLUE), ColorStop(0.33, palette.GREEN),
              ColorStop(0.66, palette.RED), ColorStop(1.0, palette.YELLOW))
    s = Scene()
    g1 = Gradient.radial((-200., -200.), 35.0, stops4,
                         center0=(-200., -200.), radius0=5.0)
    s.fill(Fill.NON_ZERO, Affine.identity(), g1, None,
           rect_path(-250, -250, -150, -150))
    g2 = Gradient.radial((70., 50.), 20.0, stops4,
                         center0=(30., 50.), radius0=5.0)
    s.fill(Fill.NON_ZERO, Affine.identity(), g2, None,
           rect_path(10, 10, 90, 90))
    purple_stops = (ColorStop(0.0, palette.PURPLE),
                    ColorStop(1.0, palette.PURPLE))
    g3 = Gradient.radial((-200., -200.), 35.0, purple_stops,
                         center0=(-200., -200.), radius0=5.0)
    s.fill(Fill.NON_ZERO, Affine.identity(), g3, None,
           rect_path(-250, -250, -150, -150))
    dev = _check("issue_1528", s)
    # pixels outside g2's cone are transparent, NOT purple (undefined
    # radial locations render as nothing; see ops/paint.py radial_t valid)
    assert float(np.abs(dev[85, 8]).max()) < 1e-3


# issues.rs:761-765 (#1707) — near-transparent solid is not snapped to 0/1
def test_issue_1707_transparent_solid_fill():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.BLACK.with_alpha(0.001), None, rect_path(0, 0, 100, 100))
    img = np.asarray(Renderer().render(
        s, RenderParams(100, 100, base_color=(0, 0, 0, 0))))
    a = float(img[50, 50, 3])
    assert 0.0 < a < 0.01


# issues.rs:376-387 — renderer reuse must not leak pixels between frames
def test_renderer_reuse_no_stale_pixels():
    r = Renderer()
    s1 = Scene()
    s1.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
            rect_path(0, 0, 64, 64))
    img1 = np.asarray(r.render(s1, RenderParams(64, 64,
                                                base_color=(0, 0, 0, 0))))
    assert float(img1[32, 32, 0]) > 0.99
    s2 = Scene()
    s2.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None,
            rect_path(16, 16, 48, 48))
    img2 = np.asarray(r.render(s2, RenderParams(64, 64,
                                                base_color=(0, 0, 0, 0))))
    assert float(np.abs(img2[2, 2]).max()) < 1e-6     # no stale red
    assert float(img2[32, 32, 1]) > 0.99


# issues.rs:335-343 (#1113) — incremental re-render of a growing scene
def test_multiple_renders_growing_scene():
    r = Renderer()
    s = Scene()
    params = RenderParams(16, 16, base_color=(0, 0, 0, 0))
    for i in range(3):
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.NAVY, None,
               rect_path(0, 0, 4.0 + 4 * i, 4.0))
        img = np.asarray(r.render(s, params))
        assert float(img[2, 2, 3]) > 0.99
