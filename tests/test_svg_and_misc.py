"""Unit tests for the SVG loader, Scene.append, and misc API surface."""

import numpy as np
import pytest

from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import circle_path, rect_path
from vello_tpu.oracle import OracleRenderer
from vello_tpu.peniko import palette
from vello_tpu.utils.svg import load_svg, parse_path_data


def test_parse_path_basic():
    p = parse_path_data("M 10 10 L 50 10 L 50 50 Z")
    lines_count = sum(1 for v, _ in p.elements() if v == 1)
    assert lines_count == 2
    assert p.verbs[-1] == 4  # close


def test_parse_path_relative_and_curves():
    p = parse_path_data("m10,10 l40,0 c10,10 20,10 30,0 q5,-5 10,0 "
                        "h10 v10 s5,5 10,0 t10,0 z")
    kinds = [v for v, _ in p.elements()]
    assert 3 in kinds and 2 in kinds  # cubic + quad present
    assert kinds[-1] == 4


def test_parse_path_arc():
    p = parse_path_data("M 0 50 A 50 50 0 0 1 100 50")
    # arc approximated by cubics
    assert any(v == 3 for v, _ in p.elements())
    pts = np.asarray(p.points)
    # arc apex should reach y ~= 0 for this sweep
    assert pts[:, 1].min() < 5.0


def test_svg_document_renders():
    svg = """<svg xmlns="http://www.w3.org/2000/svg">
      <g transform="translate(8,8) scale(0.8)">
        <rect x="0" y="0" width="60" height="60" fill="#204080"/>
        <circle cx="30" cy="30" r="20" fill="rgb(255,200,0)"
                stroke="#ffffff" stroke-width="3"/>
        <path d="M10 50 Q30 10 50 50 Z" fill="#c03030" fill-opacity="0.8"/>
        <polygon points="5,5 20,5 12,18" fill="green"/>
      </g></svg>"""
    scene = load_svg(svg)
    img = OracleRenderer().render(scene, RenderParams(64, 64))
    assert img[30, 30, 0] > 0.5   # yellow circle center (red channel high)
    assert img[50, 12, 2] > 0.3   # blue rect lower-left region


def test_scene_append_with_transform():
    sub = Scene()
    sub.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
             rect_path(0, 0, 10, 10))
    main = Scene()
    main.fill(Fill.NON_ZERO, Affine.identity(), palette.BLUE, None,
              rect_path(0, 0, 64, 64))
    main.append(sub, Affine.translate(20, 30))
    img = OracleRenderer().render(main, RenderParams(64, 64))
    assert img[35, 25, 0] > 0.9   # translated red square
    assert img[5, 5, 2] > 0.9     # blue background


def test_scene_reset():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           circle_path(32, 32, 10))
    s.reset()
    assert s.encoding.is_empty()
    img = OracleRenderer().render(s, RenderParams(16, 16))
    assert np.allclose(img[..., :3], 0.0)


def test_debug_capture_and_validation():
    from vello_tpu.utils.debug import capture_stages, validate_line_soup
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           circle_path(32, 32, 20))
    cap = capture_stages(s, RenderParams(64, 64))
    assert cap["n_lines"] > 4
    problems = validate_line_soup(cap["lines"], cap["line_path"])
    assert problems == [], problems  # closed fill must be watertight


def test_colr_v0_emoji_glyphs(tmp_path):
    """COLR v0 color glyphs render their palette layers bottom-to-top
    (scene.rs:957-1131 COLR painting adapter analog)."""
    import numpy as np
    from synth_fonts import build_colr_font
    from vello_tpu import Fill, RenderParams, Scene
    from vello_tpu.models.renderer import Renderer
    from vello_tpu.oracle import OracleRenderer
    from vello_tpu.peniko import Color
    from vello_tpu.text import Font, Glyph

    p = str(tmp_path / "colr.ttf")
    build_colr_font(p)
    f = Font(p)
    gid = f.glyph_id("A")
    layers = f.colr_layers(gid)
    assert layers is not None and len(layers) == 2
    s = Scene()
    s.draw_glyphs(f).font_size(64).brush(Color(0, 0, 0, 1)).draw(
        Fill.NON_ZERO, [Glyph(gid, 0, 60)])
    params = RenderParams(64, 64, base_color=(1, 1, 1, 1))
    a = OracleRenderer().render(s, params)
    blue = (a[..., 2] > 0.9) & (a[..., 0] < 0.2)
    red = (a[..., 0] > 0.9) & (a[..., 2] < 0.2)
    assert red.sum() > 800 and blue.sum() > 300  # both layers visible
    ys, xs = np.where(blue)
    # front layer (300..700 x 300..600 units at scale 0.064, baseline y=60)
    assert 18 <= xs.min() <= 20 and 43 <= xs.max() <= 45
    b = Renderer().render(s, params)
    d = np.abs(a - b)
    assert d.mean() < 5e-4 and d.max() < 0.05


def test_variable_font_axis(tmp_path):
    """Variable-font axis locations change the outline (skrifa
    normalized_coords analog; fontTools gvar interpolation)."""
    from synth_fonts import build_var_font
    from vello_tpu.text import Font, GlyphCache

    p = str(tmp_path / "var.ttf")
    build_var_font(p)
    widths = {}
    for w in (100, 400, 650, 900):
        f = Font(p, variations={"wght": w})
        path = GlyphCache().outline(f, f.glyph_id("B"))
        r = path.bounding_box()
        widths[w] = r.x1 - r.x0
    assert widths[400] == 400.0          # default: 100..500
    assert widths[900] == 700.0          # +300 delta on the right edge
    assert widths[100] == 400.0          # no delta below default
    assert 540 < widths[650] < 560       # interpolated (normalized 0.5)


def test_glyph_raster_cache():
    """Opt-in glyph raster atlas (glifo atlas analog): close to the vector
    result, reuses cache entries, and falls back to vectors for
    non-Color brushes."""
    import numpy as np
    from vello_tpu import Fill, RenderParams, Scene
    from vello_tpu.oracle import OracleRenderer
    from vello_tpu.peniko import Color
    from vello_tpu.text import (_GLOBAL_RASTER_CACHE, default_font,
                                layout_text)

    f = default_font()
    params = RenderParams(160, 32, base_color=(1, 1, 1, 1))

    def scene(raster):
        s = Scene()
        (s.draw_glyphs(f).font_size(20).brush(Color(0, 0, 0, 1))
         .raster(raster)
         .draw(Fill.NON_ZERO, layout_text(f, 20, "Hello glyphs", (4, 24))))
        return s

    a = OracleRenderer().render(scene(False), params)
    b = OracleRenderer().render(scene(True), params)
    d = np.abs(a - b)
    assert d.mean() < 0.02, f"raster text too far from vector: {d.mean()}"
    n0 = len(_GLOBAL_RASTER_CACHE._cache)
    OracleRenderer().render(scene(True), params)   # repeat: all cache hits
    assert len(_GLOBAL_RASTER_CACHE._cache) == n0


def test_renderer_profile_stages():
    """Renderer.profile returns per-stage device ms from one jitted frame
    (named-scope trace attribution); empty dict is acceptable on backends
    that emit no device trace rows (virtual CPU)."""
    from vello_tpu import Affine, Fill, RenderParams, Scene
    from vello_tpu.kurbo import circle_path
    from vello_tpu.models.renderer import Renderer
    from vello_tpu.peniko import palette
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           circle_path(32, 32, 20))
    st = Renderer().profile(s, RenderParams(64, 64))
    assert isinstance(st, dict)
    if st:
        assert "_total" in st and st["_total"] > 0


def test_encoding_append_rebase_markerless():
    """Encoding.append(other, T) where other's tags start before any
    transform marker must bind those segments to T, not to self's last
    transform (ADVICE round-1 low: the public-API composition trap)."""
    import numpy as np

    from vello_tpu import Affine, Fill, RenderParams, Scene
    from vello_tpu.encoding.encoding import (DRAW_COLOR, DrawRecord,
                                             Encoding)
    from vello_tpu.kurbo import rect_path
    from vello_tpu.models.renderer import Renderer
    from vello_tpu.peniko import palette
    e = Encoding()
    e.encode_fill_style(Fill.NON_ZERO)
    e.encode_path(rect_path(0, 0, 10, 10), is_fill=True)
    e.encode_draw(DrawRecord(kind=DRAW_COLOR, fill_rule=0,
                             brush=palette.RED))
    host = Scene()
    # give the host a non-identity last transform to bind to incorrectly
    host.fill(Fill.NON_ZERO, Affine.translate(100, 100), palette.NAVY,
              None, rect_path(0, 0, 1, 1))
    host.encoding.append(e, Affine.translate(20, 20))
    img = Renderer().render(host, RenderParams(48, 48))
    assert img[25, 25, 0] > 0.9     # rect landed at (20..30)
    assert img[5, 5, 0] < 0.1       # not at the origin / host transform


def test_large_viewport_4608():
    """Viewport beyond the reference's ~4096 coarse-grid warning line
    (render.rs:206-218): the tile grid, backdrop rows and composite must
    stay correct at 4608x4352 (aux 5.7 complexity scaling).

    Runs in a fresh subprocess: XLA's CPU compiler segfaults on this
    (large-tile-count) program when the parent's heap is already several
    GB deep into a long pytest session; a clean interpreter compiles and
    runs it fine."""
    import os
    import subprocess
    import sys
    script = """
import numpy as np
from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import circle_path, rect_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.peniko import palette
W, H = 4608, 4352
s = Scene()
s.fill(Fill.NON_ZERO, Affine.identity(), palette.NAVY, None,
       rect_path(0, 0, W, H))
s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
       circle_path(W - 100.5, H - 90.5, 64))
s.fill(Fill.EVEN_ODD, Affine.identity(), palette.RED.with_alpha(0.5),
       None, rect_path(10.25, H - 50.75, 200.5, H - 10.25))
img = Renderer().render(s, RenderParams(W, H))
assert img.shape == (H, W, 4)
assert np.allclose(img[H - 90, W - 100], [1, 1, 0, 1], atol=1e-3)
assert np.allclose(img[100, 100], [0, 0, 0.5, 1], atol=1e-3)
exp = np.array([0.5, 0, 0.25, 1.0])
assert np.allclose(img[H - 30, 100], exp, atol=2e-3), img[H - 30, 100]
print("large_viewport OK")
"""
    env = dict(os.environ)
    # Clear the axon-tunnel trigger: sitecustomize registers the TPU
    # tunnel whenever PALLAS_AXON_POOL_IPS is set and then forces
    # jax_platforms="axon,cpu", so a wedged tunnel would hang this child
    # at first JAX use. Explicit set (not setdefault): the parent shell
    # exports JAX_PLATFORMS=axon.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", script], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, f"stdout:{r.stdout}\nstderr:{r.stderr[-2000:]}"
    assert "large_viewport OK" in r.stdout

