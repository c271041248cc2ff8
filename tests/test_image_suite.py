"""Image suite ported from the reference sparse corpus
(``vello_sparse_tests/tests/image.rs``): extend-mode grid, brush-transform
matrix (scale/negative scale/rotate/skew/non-uniform), bilinear + bicubic
quality sweeps (identity/2x/5x/10x/rotate/translate — outputs the reference
compared against Blend2D and tiny-skia), pixel formats (RGB/RGBA/L/LA),
global alpha, opacity layers, blend modes over images, nested clips, AA
offsets, and spritesheet-style atlas sampling. Image fixtures are the
reference's own asset PNGs (test data, loaded from /root/reference).
Reference sprite tinting (set_tint) is not ported — no Scene analog yet.
Device output diffs against the scanline oracle and own goldens."""

import math
import os

import numpy as np
import pytest
from PIL import Image as PILImage

from snapshot import assert_snapshot
from test_clip_suite import crossed_line_star
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import BezPath, rect_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import (BlendMode, Compose, Extend, Image,
                              ImageQuality, Mix, palette)

ASSETS = "/root/reference/sparse_strips/vello_sparse_tests/tests/assets"


def _load(name, mode=None):
    im = PILImage.open(os.path.join(ASSETS, f"{name}.png"))
    if mode:
        im = im.convert(mode)
    return np.asarray(im)


def rgb_10() -> np.ndarray:
    return _load("rgb_image_10x10", "RGB")


def _check(name, scene, w=100, h=100, mean_tol=0.004, max_tol=None):
    params = RenderParams(w, h, base_color=(0, 0, 0, 0))
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    assert np.abs(dev - orc).mean() < mean_tol, \
        f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol)
    return dev


# image.rs:50-91 — the extend-mode grid on a 10x10 image offset to the
# center of the fill rect
@pytest.mark.parametrize("name,xe,ye", [
    ("image_reflect_x_pad_y", Extend.REFLECT, Extend.PAD),
    ("image_pad_x_repeat_y", Extend.PAD, Extend.REPEAT),
    ("image_reflect_x_reflect_y", Extend.REFLECT, Extend.REFLECT),
    ("image_repeat_x_repeat_y", Extend.REPEAT, Extend.REPEAT),
    ("image_pad_x_pad_y", Extend.PAD, Extend.PAD),
])
def test_image_extend(name, xe, ye):
    img = Image(data=rgb_10(), x_extend=xe, y_extend=ye,
                quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img,
           Affine.translate(45.0, 45.0), rect_path(10, 10, 90, 90))
    _check(name, s)


# image.rs:93-109 — bilinear sampling across a repeat/pad boundary
def test_image_bilinear_repeat_x_pad_y():
    img = Image(data=_load("rgb_image_2x2", "RGB"), x_extend=Extend.REPEAT,
                y_extend=Extend.PAD, quality=ImageQuality.MEDIUM)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, Affine.scale(10.0),
           rect_path(10, 10, 90, 90))
    _check("image_bilinear_repeat_x_pad_y", s)


# image.rs:111-252 — path-transform matrix over a repeated 10x10 image
TAN45 = math.tan(math.radians(45.0))


@pytest.mark.parametrize("name,t,rect", [
    ("image_tf_identity", Affine.identity(), (25, 25, 75, 75)),
    ("image_tf_translate", Affine.translate(25.0, 25.0), (0, 0, 50, 50)),
    ("image_tf_scale", Affine.scale(2.0), (12.5, 12.5, 37.5, 37.5)),
    ("image_tf_negative_scale",
     Affine.translate(100.0, 100.0) @ Affine.scale(-2.0),
     (12.5, 12.5, 37.5, 37.5)),
    ("image_tf_scale_translate",
     Affine((2.0, 0.0, 0.0, 2.0, 25.0, 25.0)), (0, 0, 25, 25)),
    ("image_tf_rotate_1",
     Affine.rotate_about(math.pi / 4.0, 50.0, 50.0), (25, 25, 75, 75)),
    ("image_tf_rotate_2",
     Affine.rotate_about(-math.pi / 4.0, 50.0, 50.0), (25, 25, 75, 75)),
    ("image_tf_nonuniform_scale", Affine.scale(1.0, 2.0),
     (25, 12.5, 75, 37.5)),
    ("image_tf_skew_x_1",
     Affine.translate(-50.0, 0.0) @ Affine.skew(TAN45, 0.0),
     (25, 25, 75, 75)),
    ("image_tf_skew_x_2",
     Affine.translate(50.0, 0.0) @ Affine.skew(-TAN45, 0.0),
     (25, 25, 75, 75)),
    ("image_tf_skew_y_1",
     Affine.translate(0.0, 50.0) @ Affine.skew(0.0, -TAN45),
     (25, 25, 75, 75)),
    ("image_tf_skew_y_2",
     Affine.translate(0.0, -50.0) @ Affine.skew(0.0, TAN45),
     (25, 25, 75, 75)),
])
def test_image_with_transform(name, t, rect):
    img = Image(data=rgb_10(), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, t, img, None, rect_path(*rect))
    _check(name, s)


# image.rs:253-271
def test_image_complex_shape():
    img = Image(data=rgb_10(), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None, crossed_line_star())
    _check("image_complex_shape", s)


# image.rs:272-289 — per-pixel alpha premultiplied into the source
def test_image_global_alpha():
    data = _load("rgb_image_10x10", "RGBA").copy()
    data[..., 3] = (data[..., 3].astype(np.uint16) * 75 // 255).astype(
        np.uint8)
    img = Image(data=data, x_extend=Extend.REPEAT, y_extend=Extend.REPEAT,
                quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None,
           rect_path(10, 10, 90, 90))
    dev = _check("image_global_alpha", s)
    assert 0.15 < float(dev[50, 50, 3]) < 0.45


# image.rs:290-314 — image under a 0.5 opacity layer
def test_image_with_opacity():
    img = Image(data=rgb_10(), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(0, 0, 100, 100))
    s.push_layer(Mix.NORMAL, 0.5, Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None,
           rect_path(10, 10, 90, 90))
    s.pop_layer()
    _check("image_with_opacity", s)


# image.rs:316-356 — source pixel formats (normalized at Image())
@pytest.mark.parametrize("name,asset,mode", [
    ("image_format_rgb", "rgb_image_10x10", "RGB"),
    ("image_format_rgba", "rgba_image_10x10", "RGBA"),
    ("image_format_luma", "luma_image_10x10", "L"),
    ("image_format_lumaa", "lumaa_image_10x10", "LA"),
])
def test_image_formats(name, asset, mode):
    img = Image(data=_load(asset, mode), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    assert img.data.shape[-1] == 4 and img.data.dtype == np.uint8
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None,
           rect_path(10, 10, 90, 90))
    _check(name, s)


# image.rs:357-373 — fractional rect edges keep AA over image paint
def test_image_with_anti_aliasing():
    img = Image(data=rgb_10(), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None,
           rect_path(10.5, 10.5, 90.5, 90.5))
    dev = _check("image_with_anti_aliasing", s)
    assert 0.2 < float(dev[10, 50, 3]) < 0.8      # half-covered edge row


# image.rs:374-392 — opaque image modulated by a gradient alpha mask
def test_image_opaque_with_mask():
    from vello_tpu.peniko import ColorStop, Gradient
    img = Image(data=_load("rgb_image_2x2", "RGB"), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, Affine.scale(50.0),
           rect_path(10, 10, 90, 90))
    s.push_alpha_mask_layer(1.0, Affine.identity(), None)
    g = Gradient.linear((10.0, 0.0), (90.0, 0.0), (
        ColorStop(0.0, palette.RED),
        ColorStop(0.5, palette.YELLOW.with_alpha(0.5)),
        ColorStop(1.0, palette.LIME.with_alpha(0.0))))
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           rect_path(0, 0, 100, 100))
    s.pop_layer()
    _check("image_opaque_with_mask", s)


# image.rs:393-413 — Difference blend of an image over a solid
def test_image_opaque_with_blend_mode():
    img = Image(data=_load("rgb_image_2x2", "RGB"), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None,
           rect_path(10, 10, 90, 90))
    s.push_layer(BlendMode(Mix.DIFFERENCE, Compose.SRC_OVER), 1.0,
                 Affine.identity(), None)
    s.fill(Fill.NON_ZERO, Affine.identity(), img, Affine.scale(50.0),
           rect_path(10, 10, 90, 90))
    s.pop_layer()
    _check("image_opaque_with_blend_mode", s)


# image.rs:414-615 — the bilinear/bicubic quality sweep (reference compared
# these against Blend2D and tiny-skia)
def _quality_scene(asset, transform, quality):
    img = Image(data=_load(asset, "RGB"), x_extend=Extend.REFLECT,
                y_extend=Extend.REFLECT, quality=quality)
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), img, transform,
           rect_path(10, 10, 90, 90))
    return s


@pytest.mark.parametrize("name,asset,t,q", [
    ("image_bilinear_identity", "rgb_image_2x2", Affine.identity(),
     ImageQuality.MEDIUM),
    ("image_bilinear_2x_scale", "rgb_image_2x2", Affine.scale(2.0),
     ImageQuality.MEDIUM),
    ("image_bilinear_5x_scale", "rgb_image_2x2", Affine.scale(5.0),
     ImageQuality.MEDIUM),
    ("image_bilinear_10x_scale", "rgb_image_2x2", Affine.scale(10.0),
     ImageQuality.MEDIUM),
    ("image_bilinear_with_rotation", "rgb_image_2x2",
     Affine.rotate_about(math.pi / 4.0, 50.0, 50.0) @ Affine.scale(10.0),
     ImageQuality.MEDIUM),
    ("image_bilinear_with_translation", "rgb_image_2x2",
     Affine.translate(30.0, 30.0) @ Affine.scale(10.0),
     ImageQuality.MEDIUM),
    ("image_bilinear_10x_scale_2", "rgb_image_2x3", Affine.scale(10.0),
     ImageQuality.MEDIUM),
    ("image_bicubic_identity", "rgb_image_2x2", Affine.identity(),
     ImageQuality.HIGH),
    ("image_bicubic_2x_scale", "rgb_image_2x2", Affine.scale(2.0),
     ImageQuality.HIGH),
    ("image_bicubic_5x_scale", "rgb_image_2x2", Affine.scale(5.0),
     ImageQuality.HIGH),
    ("image_bicubic_10x_scale", "rgb_image_2x2", Affine.scale(10.0),
     ImageQuality.HIGH),
    ("image_bicubic_with_rotation", "rgb_image_2x2",
     Affine.rotate_about(math.pi / 4.0, 50.0, 50.0) @ Affine.scale(10.0),
     ImageQuality.HIGH),
    ("image_bicubic_with_translation", "rgb_image_2x2",
     Affine.translate(30.0, 30.0) @ Affine.scale(10.0),
     ImageQuality.HIGH),
    ("image_bicubic_10x_scale_2", "rgb_image_2x3", Affine.scale(10.0),
     ImageQuality.HIGH),
])
def test_image_quality(name, asset, t, q):
    _check(name, _quality_scene(asset, t, q))


# image.rs:616-648 — image under two nested clips (rect + triangle)
def test_image_with_multiple_clip_layers():
    img = Image(data=_load("rgb_image_2x2", "RGB"), x_extend=Extend.REPEAT,
                y_extend=Extend.REPEAT, quality=ImageQuality.LOW)
    tri = BezPath()
    tri.move_to(90.0, 10.0)
    tri.line_to(32.0, 46.0)
    tri.line_to(54.0, 68.0)
    tri.close()
    s = Scene()
    s.push_clip_layer(Affine.identity(), rect_path(20, 20, 80, 80))
    s.push_clip_layer(Affine.identity(), tri)
    s.fill(Fill.NON_ZERO, Affine.identity(), img, None,
           rect_path(10, 10, 90, 90))
    s.pop_layer()
    s.pop_layer()
    _check("image_with_multiple_clip_layers", s)


# image.rs:650-698 — spritesheet: glyph sprites cropped out of an atlas
# image by brush-transform + Pad extend + sprite-sized fill rects
HELLO = [(1.0, 46.0, 10.0, 14.0, 0.0), (68.0, 0.0, 10.0, 12.0, 2.0),
         (27.0, 53.0, 5.0, 14.0, 0.0), (27.0, 53.0, 5.0, 14.0, 0.0),
         (80.0, 0.0, 10.0, 12.0, 2.0)]


def test_image_spritesheet():
    atlas = _load("glyph_atlas", "RGBA")
    s = Scene()
    x = 10.0
    for (ax, ay, w, h, dy) in HELLO:
        img = Image(data=atlas, x_extend=Extend.PAD, y_extend=Extend.PAD,
                    quality=ImageQuality.LOW)
        t = Affine.translate(x, 8.0 + dy)
        s.fill(Fill.NON_ZERO, t, img, Affine.translate(-ax, -ay),
               rect_path(0.0, 0.0, w, h))
        x += w
    _check("image_spritesheet", s, w=60, h=30)


# image.rs:726-747 — "hello" sprites tinted rebecca purple (alpha-mask
# tint: atlas alpha as coverage for the tint color)
def test_image_spritesheet_tinted():
    atlas = _load("glyph_atlas", "RGBA")
    s = Scene()
    x = 10.0
    for (ax, ay, w, h, dy) in HELLO:
        img = Image(data=atlas, x_extend=Extend.PAD, y_extend=Extend.PAD,
                    quality=ImageQuality.LOW,
                    tint=palette.REBECCA_PURPLE, tint_mode="alpha_mask")
        t = Affine.translate(x, 8.0 + dy)
        s.fill(Fill.NON_ZERO, t, img, Affine.translate(-ax, -ay),
               rect_path(0.0, 0.0, w, h))
        x += w
    dev = _check("image_spritesheet_tinted", s, w=60, h=30)
    ink = dev[..., 3] > 0.5
    assert ink.any()
    # tinted ink is rebecca purple, not the atlas's original color
    r = dev[..., 0][ink].mean() / dev[..., 3][ink].mean()
    assert abs(r - 102 / 255) < 0.08


# image.rs:749-768 — a fully transparent tint erases the image in BOTH
# tint modes
def test_image_fully_transparent_tint():
    base = rgb_10()
    s = Scene()
    for x, mode in [(0.0, "alpha_mask"), (50.0, "multiply")]:
        img = Image(data=base, quality=ImageQuality.LOW,
                    tint=palette.WHITE.with_alpha(0.0), tint_mode=mode)
        t = Affine.translate(x, 0.0) @ Affine.scale(5.0)
        s.fill(Fill.NON_ZERO, t, img, None, rect_path(0, 0, 10, 10))
    dev = np.asarray(Renderer().render(
        s, RenderParams(100, 100, base_color=(0, 0, 0, 0))))
    assert float(np.abs(dev[..., 3]).max()) < 1e-3
