"""Glyph suite ported from the reference sparse corpus
(``vello_sparse_tests/tests/glyph.rs``): filled runs hinted/unhinted,
stroked runs (default + 0.3 width under 10x scale + 3.0 width), stroke+fill
overlays, synthetic oblique via glyph_transform (skewed/unskewed rows), and
synthetic emboldening. Font fixture is the reference's Roboto-Regular asset
(test data). Device output diffs against the scanline oracle and own
goldens."""

import math
import os

import numpy as np
import pytest

from snapshot import assert_snapshot
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import Stroke
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import palette

ROBOTO = "/root/reference/examples/assets/roboto/Roboto-Regular.ttf"
pytestmark = pytest.mark.skipif(not os.path.exists(ROBOTO),
                                reason="reference Roboto asset absent")


def _font():
    from vello_tpu.text import Font
    return Font(ROBOTO)


def _layout(font, size, text, origin=(0.0, 0.0)):
    from vello_tpu.text import layout_text
    return layout_text(font, size, text, origin)


def _check(name, scene, w=300, h=70, mean_tol=0.004, max_tol=None):
    params = RenderParams(w, h, base_color=(1, 1, 1, 1))
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    assert np.abs(dev - orc).mean() < mean_tol, \
        f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol)
    return dev


PURPLE_50 = palette.REBECCA_PURPLE.with_alpha(0.5)


# glyph.rs:109-136 — filled, hinted and unhinted
@pytest.mark.parametrize("name,hint", [
    ("glyphs_filled", True), ("glyphs_filled_unhinted", False)])
def test_glyphs_filled(name, hint):
    font = _font()
    s = Scene()
    (s.draw_glyphs(font).font_size(50.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 50.0)).hint(hint)
     .draw(Fill.NON_ZERO, _layout(font, 50.0, "Hello, world!")))
    dev = _check(name, s)
    assert float(dev[..., 3].min()) > 0.99      # opaque white base
    assert float(dev[20:50, 5:290, 0].min()) < 0.9   # ink present


# glyph.rs:159-204 — stroked runs; width 0.3 under a 10x run scale
@pytest.mark.parametrize("name,stroke,pre", [
    ("glyphs_stroked", Stroke(width=1.0, join="round"), None),
    ("glyphs_stroked_scaled_up", Stroke(width=0.3, join="round"), 10.0),
])
def test_glyphs_stroked(name, stroke, pre):
    font = _font()
    size = 5.0 if pre else 50.0
    t = Affine.translate(0.0, size)
    if pre:
        t = Affine.scale(pre) @ t
    s = Scene()
    (s.draw_glyphs(font).font_size(size).brush(PURPLE_50).transform(t)
     .draw(stroke, _layout(font, size, "Hello, world!")))
    _check(name, s)


# glyph.rs:205-221 — stroke width comparable to stem width
def test_glyphs_large_stroke_width():
    font = _font()
    s = Scene()
    (s.draw_glyphs(font).font_size(50.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 50.0))
     .draw(Stroke(width=3.0, join="round"),
           _layout(font, 50.0, "Hello, world!")))
    _check("glyphs_large_stroke_width", s)


# glyph.rs:222-267 — stroke and fill of the same run, both orders
def test_glyphs_stroked_then_filled():
    font = _font()
    s = Scene()
    g = _layout(font, 50.0, "Hello, world!")
    (s.draw_glyphs(font).font_size(50.0).brush(palette.BLACK)
     .transform(Affine.translate(0.0, 50.0))
     .draw(Stroke(width=2.0, join="round"), g))
    g = _layout(font, 50.0, "Hello, world!")
    (s.draw_glyphs(font).font_size(50.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 50.0))
     .draw(Fill.NON_ZERO, g))
    _check("glyphs_stroked_then_filled", s, h=120)


def test_glyphs_filled_then_stroked():
    font = _font()
    s = Scene()
    g = _layout(font, 50.0, "Hello, world!")
    (s.draw_glyphs(font).font_size(50.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 50.0))
     .draw(Fill.NON_ZERO, g))
    g = _layout(font, 50.0, "Hello, world!")
    (s.draw_glyphs(font).font_size(50.0).brush(palette.BLACK)
     .transform(Affine.translate(0.0, 50.0))
     .draw(Stroke(width=2.0, join="round"), g))
    _check("glyphs_filled_then_stroked", s, h=120)


# glyph.rs:268-333 — synthetic oblique: skew the glyphs, not the run
def test_glyphs_skewed():
    font = _font()
    s = Scene()
    (s.draw_glyphs(font).font_size(50.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 50.0))
     .glyph_transform(Affine.skew(math.tan(math.radians(-14.0)), 0.0))
     .draw(Fill.NON_ZERO, _layout(font, 50.0, "Hello, world!")))
    _check("glyphs_skewed", s)


def test_glyphs_skewed_long():
    font = _font()
    s = Scene()
    (s.draw_glyphs(font).font_size(17.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 18.0))
     .glyph_transform(Affine.skew(math.tan(math.radians(-14.0)), 0.0))
     .draw(Fill.NON_ZERO, _layout(
         font, 17.0, "Lorem ipsum dolor sit amet")))
    _check("glyphs_skewed_long", s, w=250, h=75)


# glyph.rs:334-369 — skewed and unskewed lines of the same run
def test_glyphs_skewed_unskewed():
    font = _font()
    s = Scene()
    (s.draw_glyphs(font).font_size(30.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 32.0))
     .glyph_transform(Affine.skew(math.tan(math.radians(-14.0)), 0.0))
     .draw(Fill.NON_ZERO, _layout(font, 30.0, "Hello,")))
    (s.draw_glyphs(font).font_size(30.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 70.0))
     .draw(Fill.NON_ZERO, _layout(font, 30.0, "world!")))
    _check("glyphs_skewed_unskewed", s, w=150, h=125)


# glyph.rs:137-158 — regular vs synthetically emboldened text
def test_glyphs_emboldened():
    font = _font()
    s = Scene()
    (s.draw_glyphs(font).font_size(44.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 44.0))
     .draw(Fill.NON_ZERO, _layout(
         font, 44.0, "regular and emboldened")))
    (s.draw_glyphs(font).font_size(44.0).brush(PURPLE_50)
     .transform(Affine.translate(0.0, 102.0)).embolden(1.0)
     .draw(Fill.NON_ZERO, _layout(
         font, 44.0, "regular and emboldened")))
    dev = _check("glyphs_emboldened", s, w=560, h=140)
    # emboldened row carries more ink than the regular row
    top = float((1.0 - dev[10:50, :, 0]).sum())
    bot = float((1.0 - dev[68:108, :, 0]).sum())
    assert bot > top * 1.15, (top, bot)


# glyph.rs:27-108 — composition of run transform x glyph transform
def test_glyph_transform_composition():
    font = _font()
    s = Scene()
    rows = [
        (Affine.translate(5.0, 30.0), None),
        (Affine.translate(5.0, 60.0) @ Affine.scale(1.5),
         Affine.skew(0.3, 0.0)),
        (Affine.rotate_about(math.radians(-8.0), 10.0, 95.0)
         @ Affine.translate(5.0, 95.0), Affine.scale(1.2)),
    ]
    for t, gt in rows:
        d = (s.draw_glyphs(font).font_size(20.0).brush(palette.NAVY)
             .transform(t))
        if gt is not None:
            d = d.glyph_transform(gt)
        d.draw(Fill.NON_ZERO, _layout(font, 20.0, "Composed"))
    _check("glyph_transform_composition", s, w=260, h=130)
