"""COLR v1, bitmap (CBDT) glyphs, and hinting — incl. the reference's
two_emoji smoke golden (real committed pixels, independent ground truth).

Reference: vello/src/scene.rs:957-1131 (COLR adapter), glifo bitmap
strikes + hinting caches, vello_tests/tests/smoke_snapshots.rs two_emoji.
"""

import os

import numpy as np
import pytest

from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.models.renderer import Renderer
from vello_tpu.peniko import palette

ASSETS = "/root/reference/examples/assets"
COLR_FONT = f"{ASSETS}/noto_color_emoji/NotoColorEmoji-Subset.ttf"
CBDT_FONT = f"{ASSETS}/noto_color_emoji/NotoColorEmoji-CBTF-Subset.ttf"
ROBOTO = f"{ASSETS}/roboto/Roboto-Regular.ttf"

needs_assets = pytest.mark.skipif(not os.path.exists(COLR_FONT),
                                  reason="reference emoji assets absent")


@needs_assets
def test_smoke_two_emoji_matches_reference_golden():
    """COLR v1 paint graph + CBDT bitmap strike vs the reference's real
    two_emoji snapshot (smoke_snapshots.rs:50-76)."""
    from PIL import Image as PILImage

    from vello_tpu.text import Font, layout_text
    p = "/root/reference/vello_tests/snapshots/smoke/two_emoji.png"
    if not os.path.exists(p):
        pytest.skip("golden missing")
    s = Scene()
    for path, x in [(COLR_FONT, 0.0), (CBDT_FONT, 30.0)]:
        font = Font(path)
        glyphs = layout_text(font, 24.0, "\U0001F920")
        for g in glyphs:
            g.x += x
        (s.draw_glyphs(font).font_size(24.0)
         .transform(Affine.translate(0.0, 24.0))
         .draw(Fill.NON_ZERO, glyphs))
    img = np.asarray(Renderer().render(s, RenderParams(60, 30)))[..., :3]
    g = np.asarray(PILImage.open(p).convert("RGB")).astype(np.float32) / 255
    assert np.abs(img - g).mean() < 0.01


@needs_assets
def test_colr_v1_structure():
    from vello_tpu.text import Font
    font = Font(COLR_FONT)
    c1 = font.colr_v1()
    assert c1 is not None
    gid = font.glyph_id("\U0001F389")  # party popper
    assert c1.has_glyph(gid)
    s = Scene()
    assert c1.emit(s, gid, Affine.scale(24.0 / font.upem, -24.0 / font.upem)
                   @ Affine.identity(), palette.BLACK)
    assert s.encoding.n_paths > 1   # clip layers + gradient/solid fills


@needs_assets
def test_bitmap_glyph_extraction():
    from vello_tpu.text import Font
    font = Font(CBDT_FONT)
    assert font.has_bitmaps
    gid = font.glyph_id("✅")
    bm = font.bitmap_glyph(gid)
    assert bm is not None
    img, bx, by, ppem = bm
    assert img.data.shape[2] == 4 and ppem > 0
    assert img.data[..., 3].max() > 0


@needs_assets
def test_hinting_grid_fits():
    """Hinted small text at fractional offsets has fewer anti-aliased
    mid-tone pixels than unhinted (grid fitting), and both still draw."""
    from vello_tpu.text import Font, layout_text
    font = Font(ROBOTO)

    def render(hint):
        s = Scene()
        gl = layout_text(font, 11.0, "Hinted text sample 11px")
        d = (s.draw_glyphs(font).font_size(11.0).brush(palette.WHITE)
             .transform(Affine.translate(2.37, 12.61)))
        if hint:
            d.hint(True)
        d.draw(Fill.NON_ZERO, gl)
        return np.asarray(Renderer().render(s, RenderParams(128, 16)))

    a, b = render(False), render(True)
    mid = lambda im: float(((im[..., 0] > 0.1) & (im[..., 0] < 0.9)).mean())
    assert (a[..., 0] > 0.5).sum() > 50 and (b[..., 0] > 0.5).sum() > 50
    assert mid(b) < mid(a), (mid(a), mid(b))
    # hinting must not apply under rotation (falls back to vectors)
    s = Scene()
    gl = layout_text(font, 11.0, "abc")
    (s.draw_glyphs(font).font_size(11.0).brush(palette.WHITE)
     .transform(Affine.rotate(0.3) @ Affine.translate(10, 12)).hint(True)
     .draw(Fill.NON_ZERO, gl))
    img = np.asarray(Renderer().render(s, RenderParams(64, 32)))
    assert (img[..., 0] > 0.5).sum() > 10
