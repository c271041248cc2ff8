"""COLR v1 paint-graph rendering and bitmap (CBDT/sbix) glyphs.

The reference covers these via skrifa + the color-glyph adapters in
``vello/src/scene.rs:957-1131`` (COLR painting: clip to glyph, paint
solids/gradients through the transform stack, composite groups) and the
glifo bitmap strikes. Here the COLR v1 paint graph is walked once per
glyph and emitted as ordinary scene ops — fills, gradients, clip layers
(which the layered compositor's clip-chain collapse keeps cheap), and
blend layers for composite modes.

All coordinates stay in glyph space (y-up font units); the caller's
glyph transform maps them to device space.
"""

from __future__ import annotations

import io
import math
from typing import Optional

import numpy as np

from .kurbo import Affine, BezPath, rect_path
from .peniko import (BlendMode, Color, Compose, Extend, Fill, Gradient,
                     Image, ImageQuality, Mix, stops)

# OT CompositeMode -> (Mix, Compose); unlisted modes fall back to src-over
_COMPOSITE_MAP = {
    3: (Mix.NORMAL, Compose.SRC_OVER),
    6: (Mix.NORMAL, Compose.SRC_IN),
    8: (Mix.NORMAL, Compose.SRC_ATOP),
    10: (Mix.NORMAL, Compose.DEST_ATOP),
    11: (Mix.NORMAL, Compose.XOR),
    12: (Mix.NORMAL, Compose.PLUS),
    13: (Mix.SCREEN, Compose.SRC_OVER),
    14: (Mix.OVERLAY, Compose.SRC_OVER),
    15: (Mix.DARKEN, Compose.SRC_OVER),
    16: (Mix.LIGHTEN, Compose.SRC_OVER),
    17: (Mix.COLOR_DODGE, Compose.SRC_OVER),
    18: (Mix.COLOR_BURN, Compose.SRC_OVER),
    19: (Mix.HARD_LIGHT, Compose.SRC_OVER),
    20: (Mix.SOFT_LIGHT, Compose.SRC_OVER),
    21: (Mix.DIFFERENCE, Compose.SRC_OVER),
    22: (Mix.EXCLUSION, Compose.SRC_OVER),
    23: (Mix.MULTIPLY, Compose.SRC_OVER),
    24: (Mix.HUE, Compose.SRC_OVER),
    25: (Mix.SATURATION, Compose.SRC_OVER),
    26: (Mix.COLOR, Compose.SRC_OVER),
    27: (Mix.LUMINOSITY, Compose.SRC_OVER),
}

_EXTEND = {0: Extend.PAD, 1: Extend.REPEAT, 2: Extend.REFLECT}


class ColrV1:
    """COLR v1 renderer for one font (lazily built)."""

    def __init__(self, font):
        self.font = font
        tt = font.tt
        self.table = tt["COLR"].table
        self.palettes = tt["CPAL"].palettes
        self.base = {r.BaseGlyph: r.Paint
                     for r in self.table.BaseGlyphList.BaseGlyphPaintRecord}
        self.layers = (self.table.LayerList.Paint
                       if self.table.LayerList else [])
        head = tt["head"]
        self.bbox = (head.xMin, head.yMin, head.xMax, head.yMax)

    def has_glyph(self, gid: int) -> bool:
        return self.font.glyph_order[gid] in self.base

    def _color(self, palette_ix: int, alpha: float,
               foreground: Color) -> Color:
        if palette_ix == 0xFFFF:
            c = foreground
        else:
            p = self.palettes[0][palette_ix]
            c = Color(p.red / 255.0, p.green / 255.0, p.blue / 255.0,
                      p.alpha / 255.0)
        return c.multiply_alpha(alpha)

    def _stops(self, color_line, foreground: Color):
        return stops(*[(s.StopOffset,
                        self._color(s.PaletteIndex, s.Alpha, foreground))
                       for s in color_line.ColorStop])

    def _fill_rect(self) -> BezPath:
        x0, y0, x1, y1 = self.bbox
        pad = 0.1 * max(x1 - x0, y1 - y0, 1)
        return rect_path(x0 - pad, y0 - pad, x1 + pad, y1 + pad)

    def emit(self, scene, gid: int, transform: Affine,
             foreground: Color) -> bool:
        """Emit the glyph's paint graph into the scene. transform maps
        glyph space (font units, y-up) to device space."""
        paint = self.base.get(self.font.glyph_order[gid])
        if paint is None:
            return False
        # whole-glyph clip so unbounded fills never leak
        scene.push_clip_layer(transform, self._fill_rect())
        self._paint(scene, paint, transform, foreground, 0)
        scene.pop_layer()
        return True

    def _paint(self, scene, p, t: Affine, fg: Color, depth: int) -> None:
        if depth > 32:
            return
        f = p.Format
        if f == 1:      # PaintColrLayers
            lo = p.FirstLayerIndex
            for i in range(p.NumLayers):
                self._paint(scene, self.layers[lo + i], t, fg, depth + 1)
        elif f in (2, 3):    # PaintSolid
            scene.fill(Fill.NON_ZERO, t,
                       self._color(p.PaletteIndex, p.Alpha, fg), None,
                       self._fill_rect())
        elif f in (4, 5):    # PaintLinearGradient
            g = Gradient.linear((p.x0, p.y0), (p.x1, p.y1),
                                self._stops(p.ColorLine, fg),
                                _EXTEND.get(int(p.ColorLine.Extend), 0))
            scene.fill(Fill.NON_ZERO, t, g, None, self._fill_rect())
        elif f in (6, 7):    # PaintRadialGradient (two-point)
            g = Gradient.radial((p.x1, p.y1), float(p.r1),
                                self._stops(p.ColorLine, fg),
                                _EXTEND.get(int(p.ColorLine.Extend), 0),
                                center0=(p.x0, p.y0), radius0=float(p.r0))
            scene.fill(Fill.NON_ZERO, t, g, None, self._fill_rect())
        elif f in (8, 9):    # PaintSweepGradient (angles in degrees,
            # 0 = +x axis, counter-clockwise in y-up glyph space)
            a0 = math.radians(float(p.startAngle))
            a1 = math.radians(float(p.endAngle))
            g = Gradient.sweep((p.centerX, p.centerY), a0, a1,
                               self._stops(p.ColorLine, fg),
                               _EXTEND.get(int(p.ColorLine.Extend), 0))
            scene.fill(Fill.NON_ZERO, t, g, None, self._fill_rect())
        elif f == 10:   # PaintGlyph: clip to outline
            from .text import _GLOBAL_CACHE
            ggid = self.font.tt.getGlyphID(p.Glyph)
            outline = _GLOBAL_CACHE.outline(self.font, ggid)
            if outline.is_empty():
                return
            scene.push_clip_layer(t, outline)
            self._paint(scene, p.Paint, t, fg, depth + 1)
            scene.pop_layer()
        elif f == 11:   # PaintColrGlyph
            sub = self.base.get(p.Glyph)
            if sub is not None:
                self._paint(scene, sub, t, fg, depth + 1)
        elif f in (12, 13):  # PaintTransform
            m = p.Transform
            t2 = t @ Affine((m.xx, m.yx, m.xy, m.yy, m.dx, m.dy))
            self._paint(scene, p.Paint, t2, fg, depth + 1)
        elif f in (14, 15):  # PaintTranslate
            self._paint(scene, p.Paint, t @ Affine.translate(p.dx, p.dy),
                        fg, depth + 1)
        elif f in (16, 17):  # PaintScale
            self._paint(scene, p.Paint,
                        t @ Affine.scale(p.scaleX, p.scaleY), fg, depth + 1)
        elif f in (18, 19):  # PaintScaleAroundCenter
            cx, cy = p.centerX, p.centerY
            t2 = t @ (Affine.translate(cx, cy)
                      @ Affine.scale(p.scaleX, p.scaleY)
                      @ Affine.translate(-cx, -cy))
            self._paint(scene, p.Paint, t2, fg, depth + 1)
        elif f in (20, 21):  # PaintScaleUniform
            self._paint(scene, p.Paint, t @ Affine.scale(p.scale), fg,
                        depth + 1)
        elif f in (22, 23):
            cx, cy = p.centerX, p.centerY
            t2 = t @ (Affine.translate(cx, cy) @ Affine.scale(p.scale)
                      @ Affine.translate(-cx, -cy))
            self._paint(scene, p.Paint, t2, fg, depth + 1)
        elif f in (24, 25):  # PaintRotate (degrees, CCW in y-up)
            self._paint(scene, p.Paint,
                        t @ Affine.rotate(math.radians(float(p.angle))),
                        fg, depth + 1)
        elif f in (26, 27):
            cx, cy = p.centerX, p.centerY
            t2 = t @ (Affine.translate(cx, cy)
                      @ Affine.rotate(math.radians(float(p.angle)))
                      @ Affine.translate(-cx, -cy))
            self._paint(scene, p.Paint, t2, fg, depth + 1)
        elif f in (28, 29):  # PaintSkew
            sx = math.tan(math.radians(float(p.xSkewAngle)))
            sy = math.tan(math.radians(float(p.ySkewAngle)))
            self._paint(scene, p.Paint,
                        t @ Affine((1.0, -sy, -sx, 1.0, 0.0, 0.0)), fg,
                        depth + 1)
        elif f in (30, 31):
            cx, cy = p.centerX, p.centerY
            sx = math.tan(math.radians(float(p.xSkewAngle)))
            sy = math.tan(math.radians(float(p.ySkewAngle)))
            t2 = t @ (Affine.translate(cx, cy)
                      @ Affine((1.0, -sy, -sx, 1.0, 0.0, 0.0))
                      @ Affine.translate(-cx, -cy))
            self._paint(scene, p.Paint, t2, fg, depth + 1)
        elif f == 32:   # PaintComposite
            mix, compose = _COMPOSITE_MAP.get(
                int(p.CompositeMode), (Mix.NORMAL, Compose.SRC_OVER))
            self._paint(scene, p.BackdropPaint, t, fg, depth + 1)
            scene.push_layer(BlendMode(mix, compose), 1.0, t, None)
            self._paint(scene, p.SourcePaint, t, fg, depth + 1)
            scene.pop_layer()


def bitmap_glyph(font, gid: int):
    """Best-strike bitmap for a glyph from CBDT/CBLC or sbix.

    Returns (Image rgba8, bearing_x_px, bearing_y_px, ppem) or None.
    bearing_y is the distance from the baseline UP to the bitmap top
    (pixels at the strike's ppem)."""
    from PIL import Image as PILImage
    tt = font.tt
    name = font.glyph_order[gid]
    if "CBLC" in tt and "CBDT" in tt:
        strikes = tt["CBLC"].strikes
        best = max(range(len(strikes)),
                   key=lambda i: strikes[i].bitmapSizeTable.ppemY)
        data = tt["CBDT"].strikeData[best].get(name)
        if data is not None:
            data.ensureDecompiled()
            png = getattr(data, "imageData", None)
            if png:
                im = PILImage.open(io.BytesIO(png)).convert("RGBA")
                m = data.metrics
                img = Image(data=np.asarray(im, dtype=np.uint8),
                            quality=ImageQuality.MEDIUM)
                return (img, float(m.BearingX), float(m.BearingY),
                        float(strikes[best].bitmapSizeTable.ppemY))
    if "sbix" in tt:
        sb = tt["sbix"]
        ppems = sorted(sb.strikes)
        for ppem in reversed(ppems):
            g = sb.strikes[ppem].glyphs.get(name)
            if g is not None and g.graphicType == "png " and g.imageData:
                im = PILImage.open(io.BytesIO(g.imageData)).convert("RGBA")
                arr = np.asarray(im, dtype=np.uint8)
                img = Image(data=arr, quality=ImageQuality.MEDIUM)
                # sbix draws from the glyph origin; originOffset in pixels
                return (img, float(g.originOffsetX),
                        float(arr.shape[0] + g.originOffsetY), float(ppem))
    return None
