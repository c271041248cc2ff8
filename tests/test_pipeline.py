"""Differential tests: device (JAX) pipeline vs CPU oracle.

The reference's GPU-vs-CPU compare harness (vello_tests/src/compare.rs) —
same scene through both implementations, bounded pixel difference.
"""

import numpy as np
import pytest

from vello_tpu import Affine, Fill, RenderParams, Scene, Stroke
from vello_tpu.kurbo import (BezPath, circle_path, ellipse_path, rect_path,
                             rounded_rect_path, star_path)
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle import OracleRenderer
from vello_tpu.peniko import (Color, Extend, Gradient, Image, palette, stops)

PARAMS = RenderParams(64, 64, base_color=(0, 0, 0, 1))


def check(scene, params=PARAMS, mean_tol=5e-4, max_tol=0.05):
    a = OracleRenderer().render(scene, params)
    b = Renderer().render(scene, params)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert d.mean() < mean_tol, f"mean diff {d.mean()}"
    assert d.max() < max_tol, f"max diff {d.max()}"
    return b


def test_rect_fill():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(8, 8, 56, 40))
    img = check(s)
    assert img[20, 20, 0] > 0.99
    assert img[4, 4, 0] < 0.01


def test_circle_fill():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           circle_path(32, 32, 20))
    check(s)


def test_star_even_odd():
    s = Scene()
    s.fill(Fill.EVEN_ODD, Affine.identity(), palette.LIME, None,
           star_path(32, 32, 5, 10, 28))
    check(s)


def test_star_non_zero_self_intersecting():
    # self-intersecting star polygon (pentagram drawn with crossing edges)
    import math
    p = BezPath()
    for i in range(5):
        a = -math.pi / 2 + i * 4 * math.pi / 5
        x, y = 32 + 26 * math.cos(a), 32 + 26 * math.sin(a)
        if i == 0:
            p.move_to(x, y)
        else:
            p.line_to(x, y)
    p.close()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.MAGENTA, None, p)
    check(s)
    s2 = Scene()
    s2.fill(Fill.EVEN_ODD, Affine.identity(), palette.MAGENTA, None, p)
    check(s2)


def test_stroke_circle():
    s = Scene()
    s.stroke(Stroke(width=6), Affine.identity(), palette.BLUE, None,
             circle_path(32, 32, 20))
    check(s)


def test_stroke_dashed_caps_joins():
    s = Scene()
    p = BezPath().move_to(8, 10).line_to(50, 14).line_to(20, 40)
    s.stroke(Stroke(width=5, join="miter", start_cap="square",
                    end_cap="butt"), Affine.identity(), palette.YELLOW,
             None, p)
    s.stroke(Stroke(width=4).with_dashes(2.0, [8, 4]), Affine.identity(),
             palette.CYAN, None, circle_path(32, 44, 16))
    check(s)


def test_transforms():
    s = Scene()
    t = Affine.rotate_about(0.35, 32, 32) @ Affine.scale(1.3, 0.7)
    s.fill(Fill.NON_ZERO, t, palette.SEA_GREEN, None,
           rect_path(12, 20, 52, 44))
    s.fill(Fill.NON_ZERO, Affine.translate(5, -3) @ Affine.skew(0.2, 0.0),
           palette.TOMATO.with_alpha(0.7), None, ellipse_path(32, 32, 18, 10))
    check(s)


def test_gradients_linear_radial_sweep():
    s = Scene()
    g = Gradient.linear((0, 0), (64, 64),
                        stops(palette.NAVY, palette.TEAL), Extend.PAD)
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None, rect_path(0, 0, 64, 64))
    rg = Gradient.radial((32, 24), 18, stops(palette.YELLOW, palette.RED),
                         Extend.REFLECT)
    s.fill(Fill.NON_ZERO, Affine.identity(), rg, None,
           circle_path(32, 24, 18))
    sw = Gradient.sweep((32, 50), 0.0, 2 * np.pi,
                        stops(palette.BLUE, palette.MAGENTA, palette.BLUE))
    s.fill(Fill.NON_ZERO, Affine.identity(), sw, None,
           circle_path(32, 50, 12))
    check(s)


def test_gradient_with_brush_transform():
    s = Scene()
    g = Gradient.linear((0, 0), (32, 0), stops(palette.RED, palette.BLUE),
                        Extend.REPEAT)
    s.fill(Fill.NON_ZERO, Affine.identity(), g, Affine.rotate(0.5),
           rect_path(0, 0, 64, 64))
    check(s)


def test_image_paint():
    rng = np.random.default_rng(7)
    tex = (rng.uniform(0, 255, (16, 16, 4))).astype(np.uint8)
    tex[..., 3] = 255
    img = Image(tex)
    s = Scene()
    s.draw_image(img, Affine.translate(10, 10) @ Affine.scale(2.0))
    check(s, mean_tol=2e-3, max_tol=0.08)


def test_blurred_rounded_rect():
    from vello_tpu.kurbo import Rect
    s = Scene()
    s.draw_blurred_rounded_rect(Affine.identity(), Rect(16, 16, 48, 40),
                                palette.BLACK, 6.0, 4.0)
    check(s, mean_tol=2e-3, max_tol=0.05)


def test_offscreen_geometry():
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
           rect_path(-100, -20, 30, 50))
    img = check(s)
    assert img[10, 10, 0] > 0.99


def test_many_overlapping_alpha():
    s = Scene()
    rng = np.random.default_rng(3)
    colors = [palette.RED, palette.LIME, palette.BLUE, palette.YELLOW]
    for i in range(12):
        x, y = rng.uniform(8, 56, 2)
        c = colors[i % 4].with_alpha(0.5)
        s.fill(Fill.NON_ZERO, Affine.identity(), c, None,
               circle_path(x, y, rng.uniform(5, 14)))
    check(s)


def test_large_canvas_nonmultiple_of_tile():
    params = RenderParams(100, 75, base_color=(1, 1, 1, 1))
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.INDIGO, None,
           circle_path(50, 37, 30))
    check(s, params)


def test_overflow_retry():
    # Force a tiny line capacity: shrink the estimator result artificially.
    from vello_tpu.encoding.resolve import resolve
    s = Scene()
    for i in range(8):
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
               circle_path(16 + 4 * i, 32, 10))
    rs = resolve(s.encoding, PARAMS)
    rs.est_lines = 4  # lie: forces overflow -> retry doubles until it fits
    out = Renderer(max_retries=6).render_resolved(rs, PARAMS)
    ref = OracleRenderer().render(s, PARAMS)
    assert np.abs(out - ref).mean() < 5e-4


def test_msaa_modes_fix_conflation():
    """Abutting subpaths of ONE path share an edge: area AA conflates the
    two fractional coverages into a seam; sample-mask msaa16 accumulates
    per-sample winding across the whole path, so the seam vanishes
    (reference: conflation_artifacts scene + fine.wgsl fill_path_ms;
    cross-path compositing stays per-pixel alpha, as in the reference)."""
    # two triangles sharing the diagonal with OPPOSING windings (the
    # reference conflation_artifacts case, test_scenes.rs:1456): area AA
    # sums the signed fractional coverages (|2q-1| < 1 on the diagonal);
    # per-sample winding is +-1 at every sample, so msaa is solid.
    n = 48.0
    both = BezPath()
    both.move_to(8.5, 8.5).line_to(8.5 + n, 8.5 + n).line_to(8.5, 8.5 + n) \
        .close()
    both.move_to(8.5, 8.5).line_to(8.5 + n, 8.5 + n).line_to(8.5 + n, 8.5) \
        .close()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.WHITE, None, both)
    area = Renderer().render(s, PARAMS)
    msaa = Renderer().render(
        s, RenderParams(64, 64, base_color=(0, 0, 0, 1),
                        antialiasing="msaa16"))
    # area-AA conflates the shared diagonal; msaa16 must not
    assert area[30, 30, 0] < 0.99
    assert msaa[30, 30, 0] > 0.995
    # interior away from the diagonal is solid in both
    assert float(area[40, 20, 0]) == 1.0 and float(msaa[40, 20, 0]) == 1.0

    # against the supersampling oracle on a smooth shape (both are valid
    # per-sample methods there; only sample positions differ at edges —
    # note the oracle itself conflates opposing windings at subsample
    # level, so the triangles above are exactly where it must NOT be used)
    c = Scene()
    c.fill(Fill.NON_ZERO, Affine.identity(), palette.WHITE, None,
           circle_path(32, 32, 22))
    mc = Renderer().render(
        c, RenderParams(64, 64, base_color=(0, 0, 0, 1),
                        antialiasing="msaa16"))
    oc = OracleRenderer().render(
        c, RenderParams(64, 64, base_color=(0, 0, 0, 1),
                        antialiasing="msaa16"))
    assert np.abs(oc - mc).mean() < 3e-3
    # tangent pixels: 16 distinct D3D y-levels vs the grid's 4 -> up to
    # ~4/16 per-pixel at horizontal/vertical tangents
    assert np.abs(oc - mc).max() <= 0.3

    # a vertical edge at x.3: coverage = #(D3D16 sample x < .3)/16 = 5/16
    one = Scene()
    one.fill(Fill.NON_ZERO, Affine.identity(), palette.WHITE, None,
             rect_path(8, 8, 32.3, 56))
    m1 = Renderer().render(
        one, RenderParams(64, 64, base_color=(0, 0, 0, 1),
                          antialiasing="msaa16"))
    assert abs(float(m1[30, 32, 0]) - 5.0 / 16.0) < 1e-5
    assert float(m1[30, 20, 0]) == 1.0


def test_image_quality_modes():
    from vello_tpu.peniko import ImageQuality
    rng = np.random.default_rng(11)
    tex = rng.uniform(0, 255, (12, 12, 4)).astype(np.uint8)
    tex[..., 3] = 255
    for q in (ImageQuality.LOW, ImageQuality.MEDIUM, ImageQuality.HIGH):
        img = Image(tex, quality=q)
        s = Scene()
        s.draw_image(img, Affine.translate(8, 8) @ Affine.scale(3.5))
        check(s, mean_tol=3e-3, max_tol=0.1)


def test_luminance_mask_layer():
    """Content of a luminance-mask layer multiplies the backdrop's alpha by
    its luminance (reference: push_luminance_mask_layer + fine.wgsl:1150)."""
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.MAGENTA, None,
           rect_path(4, 4, 60, 60))
    s.push_luminance_mask_layer(1.0, Affine.identity(), rect_path(4, 4, 60, 60))
    g = Gradient.linear((4, 0), (60, 0), stops(palette.BLACK, palette.WHITE))
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None, rect_path(4, 4, 60, 60))
    s.pop_layer()
    img = check(s)
    assert img[32, 6, 0] < 0.1     # black mask end: magenta masked away
    assert img[32, 58, 0] > 0.9    # white mask end: magenta kept


def test_filter_layers():
    """Gaussian blur / drop shadow / offset / flood layer filters
    (sparse-strips filter suite)."""
    from vello_tpu.peniko import Color
    for build in (
        lambda s: s.push_blur_layer(3.0),
        lambda s: s.push_drop_shadow_layer(4, 4, 2.0, Color(0, 0, 0, 0.8)),
        lambda s: s.push_offset_layer(6, -4),
        lambda s: s.push_flood_layer(Color(1, 0, 1, 0.5),
                                     clip_path=circle_path(32, 32, 20)),
    ):
        s = Scene()
        build(s)
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
               circle_path(28, 28, 14))
        s.pop_layer()
        check(s, RenderParams(64, 64, base_color=(0.1, 0.1, 0.1, 1)))
    # blur visibly spreads energy beyond the shape
    s = Scene()
    s.push_blur_layer(4.0)
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.WHITE, None,
           rect_path(24, 24, 40, 40))
    s.pop_layer()
    img = Renderer().render(s, RenderParams(64, 64))
    assert 0.01 < img[32, 16, 0] < 0.6  # haze outside the rect


def test_render_u8_matches_host_conversion():
    from vello_tpu.utils.png import to_rgba8
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), Color(0.8, 0.3, 0.1, 0.7), None,
           circle_path(32, 32, 20))
    r = Renderer()
    f32 = r.render(s, PARAMS)
    u8 = r.render_u8(s, PARAMS)
    assert u8.dtype == np.uint8
    assert np.abs(u8.astype(int) - to_rgba8(f32).astype(int)).max() <= 1


def test_fragment_culling_engages_on_sparse_diagonal():
    # A long thin diagonal: bbox covers the whole canvas but live tiles are
    # only the diagonal band — est_live must engage n_live < path_tiles and
    # the render must still match the oracle exactly.
    from vello_tpu.encoding.resolve import resolve
    s = Scene()
    p = BezPath()
    p.move_to(2, 2)
    p.line_to(250, 246)
    p.line_to(246, 250)
    p.close()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.WHITE, None, p)
    params = RenderParams(256, 256, base_color=(0, 0, 0, 1))
    rs = resolve(s.encoding, params)
    caps = rs.capacities(params)
    assert rs.est_live < caps.n_path_tiles // 2, \
        f"est_live {rs.est_live} not sparse vs {caps.n_path_tiles}"
    r = Renderer()
    b = r.render(s, params)
    assert r.last_profile["n_live"] > 0, "culling did not engage"
    assert r.last_profile["retries"] == 0, "live cap underestimated"
    a = OracleRenderer().render(s, params)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert d.max() < 0.05 and d.mean() < 5e-4


def test_radial_gradient_degenerate_kinds():
    """The four two-point-conic kinds of draw_leaf.wgsl/config.wgsl:60-72:
    circular, strip (r0==r1), focal-on-circle (a==0), cone (natural edge
    -> invalid region stays base color)."""
    from vello_tpu.kurbo import rect_path
    from vello_tpu.peniko import Extend, Gradient, palette, stops as mk

    cs = mk((0.0, palette.RED), (0.5, palette.YELLOW), (1.0, palette.BLUE))

    def radial(c0, r0, c1, r1):
        return Gradient.radial(c1, r1, cs, Extend.REPEAT,
                               center0=c0, radius0=r0)

    cases = [radial((32, 32), 5, (32, 32), 28),      # circular
             radial((80, 32), 10, (114, 32), 10),    # strip
             radial((16, 96), 0, (40, 96), 24),      # focal on circle
             radial((84, 96), 8, (110, 96), 23)]     # cone
    s = Scene()
    for i, g in enumerate(cases):
        x0, y0 = (i % 2) * 64, (i // 2) * 64
        s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
               rect_path(x0 + 2, y0 + 2, x0 + 62, y0 + 62))
    params = RenderParams(128, 128, base_color=(0.1, 0.1, 0.1, 1.0))
    b = check(s, params)
    assert not np.isnan(b).any()
    # semantic checks: cone's invalid region (left of the cone apex at the
    # panel's left edge) keeps the base color; strip paints between the
    # parallel edges
    assert abs(b[96, 67, 0] - 0.1) < 0.02      # outside cone: base
    assert b[96, 108, 3] > 0.99                # inside cone: painted
    assert b[32, 96, 3] > 0.99                 # strip band painted


def test_clip_chain_collapse():
    """Simple clip chains (normal/src-over, single draw) collapse into
    per-fragment clip-coverage multipliers: a 50-cell scene of 2-deep
    nested clips compiles to ONE draws op, and a blend-mode layer still
    gets real push/pop ops (reference many_clips / blend_grid scale)."""
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.kurbo import star_path
    from vello_tpu.pipeline.layered import OP_DRAWS, build_layer_plan

    s = Scene()
    for i in range(50):
        cx, cy = 14.0 * (i % 8) + 10, 14.0 * (i // 8) + 10
        s.push_clip_layer(Affine.identity(), circle_path(cx, cy, 7))
        s.push_clip_layer(Affine.rotate_about(0.3 * i, cx, cy),
                          rect_path(cx - 6, cy - 6, cx + 6, cy + 6))
        s.fill(Fill.NON_ZERO, Affine.identity(),
               palette.RED.with_alpha(0.9), None, star_path(cx, cy, 5, 8, 3))
        s.pop_layer()
        s.pop_layer()
    rs = resolve(s.encoding, PARAMS)
    plan, dyn, _, _ = build_layer_plan(rs)
    assert [op[0] for op in plan.ops] == [OP_DRAWS]
    assert plan.n_clip_levels == 2
    dev = Renderer().render(s, PARAMS)
    orc = OracleRenderer().render(s, PARAMS)
    assert np.abs(dev - orc).mean() < 2e-3

    # non-collapsible: a multiply-blend layer keeps push/pop ops
    s2 = Scene()
    s2.fill(Fill.NON_ZERO, Affine.identity(), palette.NAVY, None,
            rect_path(0, 0, 64, 64))
    from vello_tpu.peniko import BlendMode, Compose, Mix
    s2.push_layer(BlendMode(Mix.MULTIPLY, Compose.SRC_OVER), 1.0,
                  Affine.identity(), circle_path(32, 32, 20))
    s2.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
            rect_path(10, 10, 54, 54))
    s2.pop_layer()
    rs2 = resolve(s2.encoding, PARAMS)
    plan2, _, _, _ = build_layer_plan(rs2)
    kinds = [op[0] for op in plan2.ops]
    assert 1 in kinds and 2 in kinds  # OP_PUSH, OP_POP survive
    dev2 = Renderer().render(s2, PARAMS)
    orc2 = OracleRenderer().render(s2, PARAMS)
    assert np.abs(dev2 - orc2).mean() < 2e-3


def test_occlusion_culling_correct():
    """Opaque full-coverage fills advance the composite walk: stacking
    many covered layers must not change the image (depth.rs DepthBuffer
    role), including translucent content above the last opaque cover."""
    s = Scene()
    for i in range(20):
        c = [palette.RED, palette.NAVY, palette.TEAL][i % 3]
        s.fill(Fill.NON_ZERO, Affine.identity(), c, None,
               rect_path(0, 0, 64, 64))
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
           rect_path(0, 0, 64, 64))                  # last opaque cover
    s.fill(Fill.NON_ZERO, Affine.identity(),
           palette.BLUE.with_alpha(0.5), None, circle_path(32, 32, 16))
    dev = Renderer().render(s, PARAMS)
    orc = OracleRenderer().render(s, PARAMS)
    assert np.abs(dev - orc).mean() < 1e-3
    # corners show pure yellow (everything below culled, nothing leaked)
    assert np.allclose(dev[2, 2], [1, 1, 0, 1], atol=1e-3)

    # direct unit check of the walk-start advancement + the composite
    # kernel honoring (los, his), in interpret mode
    import jax.numpy as jnp

    from vello_tpu.ops.pallas_kernels import NPX, fine_composite_solid
    from vello_tpu.pipeline.render import occlusion_los
    g_s = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
    cov = jnp.stack([jnp.full(NPX, v) for v in
                     [0.4, 1.0, 0.5, 1.0, 1.0, 0.3]])
    opq = jnp.asarray([True, True, False, False, True, True])
    starts = jnp.asarray([0, 3, 5, 6, 6], jnp.int32)  # 4 tiles (one empty)
    los, his = occlusion_los(g_s, cov, opq, 4, starts)
    # tile 0: frag 1 is the last opaque cover; tile 1: frag 4;
    # tile 2: frag 5 is opaque but NOT full -> no advance; tile 3 empty
    assert los.tolist() == [1, 4, 5, 6]
    assert his.tolist() == [3, 5, 6, 6]
    rng = np.random.default_rng(0)
    a = rng.uniform(0.2, 1.0, (6, 1, 1)).astype(np.float32)
    src = (rng.uniform(0, 1, (6, 4, NPX)).astype(np.float32) * a)
    src[:, 3] = a[:, 0]
    base = np.array([0.1, 0.2, 0.3, 1.0], np.float32)
    ref = fine_composite_solid(jnp.asarray(src), jnp.asarray(base),
                               starts, 4, interpret=True)
    adv = fine_composite_solid(jnp.asarray(src), jnp.asarray(base),
                               (los, his), 4, interpret=True)
    # advancing from an OPAQUE cover yields the same pixels as the full
    # walk wherever the cover has alpha 1
    src2 = src.copy(); src2[1, 3] = 1.0; src2[1, :3] *= 1.0 / max(a[1,0,0], 1e-6)
    ref2 = fine_composite_solid(jnp.asarray(src2), jnp.asarray(base),
                                starts, 4, interpret=True)
    adv2 = fine_composite_solid(jnp.asarray(src2), jnp.asarray(base),
                                (los, his), 4, interpret=True)
    np.testing.assert_allclose(np.asarray(adv2[0]), np.asarray(ref2[0]),
                               atol=1e-5)


def test_layered_scan_structure_reuse():
    """The plan-as-data layered pipeline compiles ONCE per bucketed
    (op-count, depth) — different layer structures at the same buckets
    reuse the executable (round-1: every structure recompiled)."""
    from vello_tpu.pipeline import layered as L

    def scene_with(n_layers, mix):
        s = Scene()
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.NAVY, None,
               rect_path(0, 0, 64, 64))
        from vello_tpu.peniko import BlendMode, Compose
        for i in range(n_layers):
            s.push_layer(BlendMode(mix, Compose.SRC_OVER), 0.9,
                         Affine.identity(), circle_path(20 + 6 * i, 32, 14))
            s.fill(Fill.NON_ZERO, Affine.identity(), palette.YELLOW, None,
                   rect_path(4 * i, 10, 4 * i + 20, 50))
        for _ in range(n_layers):
            s.pop_layer()
        return s

    from vello_tpu.peniko import Mix
    before = len(L._JIT_CACHE)
    a = Renderer().render(scene_with(6, Mix.MULTIPLY), PARAMS)
    n1 = len(L._JIT_CACHE)
    # different structure, different mixes/alpha — same op/depth buckets
    b = Renderer().render(scene_with(5, Mix.SCREEN), PARAMS)
    n2 = len(L._JIT_CACHE)
    assert n1 == before + 1
    assert n2 == n1, "same-bucket structure recompiled"
    # and both are correct vs the oracle
    oa = OracleRenderer().render(scene_with(6, Mix.MULTIPLY), PARAMS)
    ob = OracleRenderer().render(scene_with(5, Mix.SCREEN), PARAMS)
    assert np.abs(a - oa).mean() < 2e-3
    assert np.abs(b - ob).mean() < 2e-3


def test_render_mode_speed_lowp():
    """render_mode="speed" (bf16 fine tensors, the OptimizeSpeed /
    fine/lowp.rs analog) stays within the reference's own cpu_u8
    tolerance (<=2/255 per channel) of the quality mode."""
    from vello_tpu.scenes.test_scenes import splash
    s = splash(128.0)
    q = Renderer().render(s, RenderParams(128, 128))
    f = Renderer().render(s, RenderParams(128, 128, render_mode="speed"))
    d = np.abs(q - f)
    assert d.max() <= 2.5 / 255.0, float(d.max())
    assert d.mean() < 1e-3
