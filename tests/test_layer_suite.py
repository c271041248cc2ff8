"""Layer-property and wide-tile suites ported from the reference's sparse
snapshot corpus (``vello_sparse_tests/tests/{layer,opacity,wide_tile}.rs``):
combined clip+blend+alpha+mask layers, nested opacity layers, and the
viewport-row edge cases the reference keeps from its wide-tile era (clips
spanning/outside narrow viewports, layer stacks interleaved with unlayered
draws). Scenes re-authored against our Scene API; device output diffs
against the independent scanline oracle and own goldens."""

import numpy as np
import pytest

from snapshot import assert_snapshot
from test_clip_suite import crossed_line_star
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import circle_path, rect_path, BezPath
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import (BlendMode, Color, ColorStop, Compose, Gradient,
                              Mix, palette)


def _check(name, scene, w=100, h=100, base=(0, 0, 0, 0), mean_tol=0.003,
           max_tol=None):
    params = RenderParams(w, h, base_color=base)
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    assert np.abs(dev - orc).mean() < mean_tol, \
        f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol)
    return dev


def _example_mask_content(scene):
    """The mask.rs example_mask content: a horizontal gradient whose alpha
    ramps 1 -> 0.5 -> 0 (mask.rs:16-46)."""
    g = Gradient.linear((10.0, 0.0), (90.0, 0.0), (
        ColorStop(0.0, palette.RED),
        ColorStop(0.5, palette.YELLOW.with_alpha(0.5)),
        ColorStop(1.0, palette.LIME.with_alpha(0.0))))
    scene.fill(Fill.NON_ZERO, Affine.identity(), g, None,
               rect_path(0, 0, 100, 100))


# layer.rs:12-29 — one layer carrying clip + Lighten blend + alpha + mask
# at once (ours: blend/alpha/clip on the outer layer, the mask as a nested
# alpha-mask layer — same composition order as the reference's single call)
def test_layer_multiple_properties():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLUE, None,
           rect_path(10, 10, 90, 90))
    s.push_layer(BlendMode(Mix.LIGHTEN, Compose.SRC_OVER), 0.78,
                 Affine.identity(), crossed_line_star())
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(10, 10, 90, 90))
    s.push_alpha_mask_layer(1.0, Affine.identity(), None)
    _example_mask_content(s)
    s.pop_layer()
    s.pop_layer()
    _check("layer_multiple_properties", s)


# opacity.rs:9-20 — three overlapping circles under one 0.27-alpha layer
def test_opacity_on_layer():
    s = Scene()
    s.push_layer(Mix.NORMAL, 0.27, Affine.identity(), None)
    for (cx, cy, c) in [(35.0, 35.0, palette.RED),
                        (65.0, 35.0, palette.GREEN),
                        (50.0, 65.0, palette.BLUE)]:
        s.fill(Fill.NON_ZERO, Affine.identity(), c, None,
               circle_path(cx, cy, 30.0))
    s.pop_layer()
    dev = _check("opacity_on_layer", s)
    # overlap region shows the TOP circle at 0.27 (isolated layer: inner
    # src-over first, alpha applies once at pop)
    assert abs(float(dev[40, 50, 3]) - 0.27) < 0.01


# opacity.rs:22-34 — nested 0.5 x 0.5 opacity layers
def test_opacity_nested_on_layer():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(10, 10, 90, 90))
    s.push_layer(Mix.NORMAL, 0.5, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
           rect_path(25, 25, 75, 75))
    s.push_layer(Mix.NORMAL, 0.5, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.GREEN, None,
           rect_path(40, 40, 60, 60))
    s.pop_layer()
    s.pop_layer()
    _check("opacity_nested_on_layer", s)


# wide_tile.rs:16-33 — three nested clips staggered across one tile row
def test_wide_tile_clip_single_row():
    s = Scene()
    colors = [palette.RED, palette.GREEN, palette.BLUE]
    for i, c in enumerate(colors):
        s.push_clip_layer(Affine.identity(),
                          rect_path(i * 100.0 / 3.0, 0.0, 100.0, 16.0))
        s.fill(Fill.NON_ZERO, Affine.identity(), c, None,
               rect_path(0, 0, 100, 16))
    for _ in colors:
        s.pop_layer()
    _check("wide_tile_clip_single_row", s, w=100, h=8)


# wide_tile.rs:35-40 (PR #975) — empty clip layer entirely out of bounds
def test_clip_out_of_bounds_empty():
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(300, 8, 350, 48))
    s.pop_layer()
    params = RenderParams(100, 100, base_color=(0, 0, 0, 0))
    dev = Renderer().render(s, params)
    assert float(np.abs(dev).max()) < 1e-6


# wide_tile.rs:42-66 — a no-op Offset filter layer whose bbox starts
# mid-viewport must not shift complex paints
def test_filter_layer_offset_gradient_shift():
    s = Scene()
    g = Gradient.linear((256.0, 0.0), (512.0, 0.0), (
        ColorStop(0.0, palette.BLUE), ColorStop(0.33, palette.GREEN),
        ColorStop(0.66, palette.RED), ColorStop(1.0, palette.YELLOW)))
    s.push_offset_layer(0, 0)
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           rect_path(256, 0, 612, 4))
    s.pop_layer()
    params = RenderParams(512, 4, base_color=(0, 0, 0, 0))
    dev = Renderer().render(s, params)
    assert_snapshot("filter_offset_gradient_shift", dev, mean_tol=0.004)
    # the whole gradient must be visible: blue at x=260, yellowish at 508
    assert float(dev[2, 260, 2]) > 0.8          # blue end
    assert float(dev[2, 508, 0]) > 0.8          # red/yellow end
    assert float(dev[2, 508, 2]) < 0.3


# wide_tile.rs:68-84 — one gradient spanning multiple tile columns
def test_gradient_spanning_tiles():
    s = Scene()
    g = Gradient.linear((0.0, 0.0), (600.0, 0.0), (
        ColorStop(0.0, palette.GREEN), ColorStop(1.0, palette.BLUE)))
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           rect_path(4, 4, 596, 28))
    _check("gradient_spanning_tiles", s, w=600, h=32)


# wide_tile.rs:86-99 — even-odd shape crossing the right viewport edge
def test_shape_at_viewport_boundary():
    p = BezPath()
    p.move_to(248.0, 0.0)
    p.line_to(257.0, 0.0)
    p.line_to(257.0, 2.0)
    p.line_to(248.0, 2.0)
    p.close()
    s = Scene()
    s.fill(Fill.EVEN_ODD, Affine.identity(), palette.LIME, None, p)
    params = RenderParams(256, 4, base_color=(0, 0, 0, 0))
    dev = Renderer().render(s, params)
    orc = OracleRenderer().render(s, params)
    assert np.abs(dev - orc).mean() < 0.003
    assert float(dev[1, 250, 1]) > 0.9      # filled inside
    assert float(dev[3, 250, 1]) < 1e-3     # below the shape


# wide_tile.rs:101-151 — layer stacks interleaved with unlayered draws
# (the reference's "fast path strips / coarse batch in later rounds" bugs)
def _nested_noop_layers(s, n):
    for _ in range(n):
        s.push_layer(Mix.NORMAL, 1.0, Affine.identity(), None)


def test_draw_after_nested_layers():
    s = Scene()
    _nested_noop_layers(s, 3)
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(0, 0, 255),
           None, rect_path(10, 10, 70, 70))
    for _ in range(3):
        s.pop_layer()
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(255, 0, 0),
           None, rect_path(30, 30, 90, 90))
    _check("draw_after_nested_layers", s)


def test_layer_after_nested_layers():
    s = Scene()
    _nested_noop_layers(s, 3)
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(0, 0, 255),
           None, rect_path(10, 10, 70, 70))
    for _ in range(3):
        s.pop_layer()
    s.push_layer(Mix.NORMAL, 1.0, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(255, 0, 0),
           None, rect_path(30, 30, 90, 90))
    s.pop_layer()
    _check("layer_after_nested_layers", s)


def test_draw_and_layer_after_nested_layers():
    s = Scene()
    _nested_noop_layers(s, 3)
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(0, 0, 255),
           None, rect_path(25, 10, 75, 60))
    for _ in range(3):
        s.pop_layer()
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(0, 255, 0),
           None, rect_path(10, 40, 60, 90))
    s.push_layer(Mix.NORMAL, 1.0, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), Color.from_rgba8(255, 0, 0),
           None, rect_path(40, 40, 90, 90))
    s.pop_layer()
    _check("draw_and_layer_after_nested_layers", s)
