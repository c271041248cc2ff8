"""Exhaustive blend suites ported from the reference's sparse snapshot
corpus (``vello_sparse_tests/tests/{compose,mix,mask}.rs`` + wide-tile /
edge-of-viewport cases from ``wide_tile.rs``): the full Porter-Duff compose
grid, the full W3C mix grid over image+gradient content, explicit
alpha/luminance masks, and viewport-boundary geometry. Scenes are
re-authored against our Scene API; device output diffs against the
independent scanline oracle and own goldens."""

import numpy as np
import pytest

from snapshot import assert_snapshot
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import BezPath, circle_path, rect_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import (BlendMode, Color, Compose, Gradient, Image,
                              Mix, palette)


def _stops(*cs):
    from vello_tpu.peniko import ColorStop
    n = len(cs)
    return [ColorStop(i / (n - 1), c) for i, c in enumerate(cs)]


def _check(name, scene, w=100, h=100, base=(0, 0, 0, 0), mean_tol=0.003,
           max_tol=None):
    params = RenderParams(w, h, base_color=base)
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    assert np.abs(dev - orc).mean() < mean_tol, \
        f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol)


# ---------------------------------------------------------------------------
# Compose grid (compose.rs: yellow dest rect, blue src rect, one compose
# layer inside a normal isolation layer)

def _compose_scene(compose):
    s = Scene()
    s.push_layer(BlendMode(Mix.NORMAL, Compose.SRC_OVER), 1.0,
                 Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
           rect_path(10, 10, 70, 70))
    s.push_layer(BlendMode(Mix.NORMAL, compose), 1.0, Affine.identity(),
                 None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLUE, None,
           rect_path(30, 30, 90, 90))
    s.pop_layer()
    s.pop_layer()
    return s


@pytest.mark.parametrize("compose", list(Compose))
def test_compose_grid(compose):
    _check(f"compose_{compose.name.lower()}", _compose_scene(compose))


def test_compose_clear_empty_layer():
    s = Scene()
    s.push_layer(Mix.NORMAL, 1.0, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLUE, None,
           rect_path(10, 10, 90, 90))
    s.push_layer(BlendMode(Mix.NORMAL, Compose.CLEAR), 1.0,
                 Affine.identity(), None)
    s.pop_layer()
    s.pop_layer()
    _check("compose_clear_empty_layer", s)


# ---------------------------------------------------------------------------
# Mix grid (mix.rs: image dest + 5-stop translucent gradient src)

def _test_image(w=80, h=80):
    """Deterministic colorful image standing in for the reference's cowboy
    asset (content differs; coverage target is the mix math)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    r = (xs / w * 255).astype(np.uint8)
    g = (ys / h * 255).astype(np.uint8)
    b = (((xs // 10 + ys // 10) % 2) * 200 + 30).astype(np.uint8)
    a = np.full((h, w), 255, np.uint8)
    rgba = np.stack([r, g, b, a], axis=-1)
    return Image(rgba)


def _mix_scene(mix):
    s = Scene()
    grad = Gradient.linear((0, 0), (80, 0), _stops(
        palette.BLUE.with_alpha(0.86), Color(1, 0, 1, 0.86),
        palette.RED.with_alpha(0.86), palette.YELLOW.with_alpha(0.86),
        Color(0, 1, 0, 0.86)))
    t = Affine.translate(10, 10)
    s.fill(Fill.NON_ZERO, t, _test_image(), None, rect_path(0, 0, 80, 80))
    s.push_layer(BlendMode(mix, Compose.SRC_OVER), 1.0, t, None)
    s.fill(Fill.NON_ZERO, t, grad, None, rect_path(0, 0, 80, 80))
    s.pop_layer()
    return s


@pytest.mark.parametrize(
    "mix", [m for m in Mix if m != Mix.CLIP])
def test_mix_grid(mix):
    _check(f"mix_{mix.name.lower()}", _mix_scene(mix))


# ---------------------------------------------------------------------------
# Masks (mask.rs): content masked by drawn gradient content — alpha and
# luminance variants, via nested mask layers.

def _mask_scene(luminance: bool):
    s = Scene()
    grad = Gradient.linear((10, 0), (90, 0), _stops(
        palette.RED, palette.YELLOW.with_alpha(0.5),
        Color(0, 1, 0, 0.0)))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.BLACK, None,
           rect_path(10, 10, 90, 90))
    s.push_layer(Mix.NORMAL, 1.0, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(10, 10, 90, 90))
    if luminance:
        s.push_luminance_mask_layer(1.0, Affine.identity(), None)
    else:
        s.push_alpha_mask_layer(1.0, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), grad, None,
           rect_path(10, 10, 90, 90))
    s.pop_layer()
    s.pop_layer()
    return s


def test_mask_luminance():
    _check("mask_luminance", _mask_scene(True))


def test_mask_alpha():
    _check("mask_alpha", _mask_scene(False))


# ---------------------------------------------------------------------------
# Wide-tile / edge-of-viewport cases (wide_tile.rs role): geometry exactly
# on tile and viewport boundaries, and overflowing every edge.

def test_viewport_edge_rects():
    s = Scene()
    # exactly tile-aligned edges (x/y multiples of 16)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(16, 16, 48, 48))
    # spanning the full viewport width at the top row
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.LIME.with_alpha(0.7), None, rect_path(0, 0, 100, 8))
    # overflowing all four edges
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.BLUE.with_alpha(0.5), None,
           rect_path(-20, -20, 120, 120))
    # sliver exactly at the right/bottom viewport boundary
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
           rect_path(99, 0, 100, 100))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.CYAN, None,
           rect_path(0, 99, 100, 100))
    _check("viewport_edge_rects", s, base=(0, 0, 0, 1))


def test_left_edge_crossing_shapes():
    """Geometry crossing x=0 exercises the edge-vertical winding carriers
    (and the has_edge static-skip guard's conservative hull test)."""
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           circle_path(-10, 30, 25))
    s.fill(Fill.EVEN_ODD, Affine.identity(),
           palette.BLUE.with_alpha(0.8), None,
           circle_path(5, 70, 20))
    p = (BezPath().move_to(-30, 10).line_to(60, 40).line_to(-30, 90)
         .close())
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.LIME.with_alpha(0.6), None, p)
    _check("left_edge_crossing", s, base=(0.05, 0.05, 0.05, 1))


def test_atlas_many_images():
    """Multi-entry atlas: a grid of distinct small images in one scene
    (image_atlas.rs stress role at the scene level)."""
    s = Scene()
    rng = np.random.default_rng(11)
    for i in range(12):
        w = int(rng.integers(6, 20))
        h = int(rng.integers(6, 20))
        rgba = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
        rgba[..., 3] = 255
        img = Image(rgba)
        x = (i % 4) * 25 + 2
        y = (i // 4) * 30 + 2
        s.fill(Fill.NON_ZERO, Affine.translate(x, y), img, None,
               rect_path(0, 0, w, h))
    _check("atlas_many_images", s, base=(0, 0, 0, 1), mean_tol=0.004)
