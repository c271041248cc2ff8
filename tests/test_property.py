"""Property tests (reference: vello_tests/tests/property.rs): randomized
scenes through both renderers; invariants that must hold for any input."""

import numpy as np
import pytest

from vello_tpu import Affine, Fill, RenderParams, Scene, Stroke
from vello_tpu.kurbo import BezPath
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle import OracleRenderer
from vello_tpu.peniko import palette

COLORS = [palette.RED, palette.LIME, palette.BLUE, palette.YELLOW,
          palette.CYAN, palette.MAGENTA]


def random_path(rng, n_verbs=8, span=64.0):
    p = BezPath()
    p.move_to(*rng.uniform(0, span, 2))
    for _ in range(n_verbs):
        k = rng.integers(0, 4)
        if k == 0:
            p.line_to(*rng.uniform(-8, span + 8, 2))
        elif k == 1:
            p.quad_to(*rng.uniform(-8, span + 8, 4))
        elif k == 2:
            p.curve_to(*rng.uniform(-8, span + 8, 6))
        else:
            p.close()
    return p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_scene_device_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    for i in range(6):
        path = random_path(rng)
        rule = Fill.NON_ZERO if rng.random() < 0.5 else Fill.EVEN_ODD
        c = COLORS[i % 6].with_alpha(float(rng.uniform(0.3, 1.0)))
        t = Affine.rotate_about(float(rng.uniform(-0.5, 0.5)), 32, 32)
        if rng.random() < 0.3:
            s.stroke(Stroke(width=float(rng.uniform(1, 6))), t, c, None,
                     path)
        else:
            s.fill(rule, t, c, None, path)
    params = RenderParams(64, 64, base_color=(0, 0, 0, 1))
    a = OracleRenderer().render(s, params)
    b = Renderer().render(s, params)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert np.isfinite(b).all()
    assert d.mean() < 1e-3, d.mean()
    # random torture paths hit tile-boundary epsilon cases; a few
    # isolated edge pixels may differ visibly between formulations
    assert d.max() < 0.3, d.max()
    assert (d.max(axis=-1) > 0.05).sum() < 10


def test_output_range_invariants():
    rng = np.random.default_rng(7)
    s = Scene()
    for i in range(4):
        s.fill(Fill.NON_ZERO, Affine.identity(),
               COLORS[i].with_alpha(0.7), None, random_path(rng))
    img = Renderer().render(s, RenderParams(64, 64))
    # premultiplied invariants: 0 <= rgb <= a <= 1
    assert (img >= -1e-6).all() and (img <= 1 + 1e-6).all()
    assert (img[..., :3] <= img[..., 3:4] + 1e-5).all()


def test_probe():
    from vello_tpu.utils.probe import (regenerate_probe_reference, run_probe,
                                       PROBE_PATH)
    import os
    if not os.path.exists(PROBE_PATH):
        regenerate_probe_reference()
    assert run_probe(Renderer())
    assert run_probe(OracleRenderer())


@pytest.mark.parametrize("seed", [11, 18, 24, 25, 28])
def test_fuzz_offscreen_torture(seed):
    """Regression fuzz (found the endpoint-exactness bug): random scenes
    with geometry crossing all viewport edges; device and oracle must agree
    except on a handful of isolated boundary pixels."""
    rng = np.random.default_rng(seed)
    s = Scene()
    for i in range(5):
        path = BezPath()
        path.move_to(*rng.uniform(-10, 74, 2))
        for _ in range(6):
            k = rng.integers(0, 4)
            if k == 0:
                path.line_to(*rng.uniform(-10, 74, 2))
            elif k == 1:
                path.quad_to(*rng.uniform(-10, 74, 4))
            elif k == 2:
                path.curve_to(*rng.uniform(-10, 74, 6))
            else:
                path.close()
        c = COLORS[i % 6].with_alpha(float(rng.uniform(0.3, 1.0)))
        rule = Fill.NON_ZERO if rng.random() < 0.5 else Fill.EVEN_ODD
        if rng.random() < 0.25:
            s.stroke(Stroke(width=float(rng.uniform(0.5, 8))),
                     Affine.identity(), c, None, path)
        else:
            s.fill(rule, Affine.rotate_about(float(rng.uniform(-1, 1)),
                                             32, 32), c, None, path)
    params = RenderParams(64, 64, base_color=(0, 0, 0, 1))
    a = OracleRenderer().render(s, params)
    b = Renderer().render(s, params)
    d = np.abs(a.astype(np.float64) - b)
    assert d.mean() < 5e-4, d.mean()
    assert (d.max(axis=-1) > 0.05).sum() < 20


@pytest.mark.parametrize("seed", [1001, 1013, 1014])
def test_fuzz_layer_trees(seed):
    """Random nested layer trees (mix x compose x alpha x clip shapes)."""
    from vello_tpu.kurbo import circle_path, star_path
    from vello_tpu.peniko import BlendMode, Compose, Mix
    rng = np.random.default_rng(seed)
    s = Scene()
    depth = 0
    for step in range(8):
        roll = rng.random()
        if roll < 0.3 and depth < 3:
            shape = circle_path(*rng.uniform(8, 56, 2),
                                rng.uniform(8, 30)) \
                if rng.random() < 0.5 else \
                star_path(*rng.uniform(10, 54, 2), int(rng.integers(3, 7)),
                          rng.uniform(4, 10), rng.uniform(12, 28))
            mix = Mix(int(rng.integers(0, 16)))
            comp = Compose([3, 5, 6, 9, 11, 12][int(rng.integers(0, 6))])
            s.push_layer(BlendMode(mix, comp),
                         float(rng.uniform(0.4, 1.0)),
                         Affine.identity(), shape)
            depth += 1
        elif roll < 0.45 and depth > 0:
            s.pop_layer()
            depth -= 1
        else:
            p = random_path(rng, n_verbs=4)
            c = COLORS[int(rng.integers(0, 6))].with_alpha(
                float(rng.uniform(0.4, 1.0)))
            s.fill(Fill.NON_ZERO, Affine.identity(), c, None, p)
    while depth > 0:
        s.pop_layer()
        depth -= 1
    params = RenderParams(64, 64, base_color=(0.1, 0.1, 0.1, 1))
    a = OracleRenderer().render(s, params)
    b = Renderer().render(s, params)
    d = np.abs(a.astype(np.float64) - b)
    assert d.mean() < 1e-4, d.mean()
    assert (d.max(axis=-1) > 0.05).sum() <= 3


@pytest.mark.parametrize("seed", [7, 19, 42])
def test_fuzz_text_filters_clips_combined(seed):
    """Cross-feature fuzz: raster+vector text, clip layers, blur/shadow
    filters, and gradients in one scene — device vs oracle."""
    from vello_tpu.kurbo import circle_path, rect_path
    from vello_tpu.peniko import Extend, Gradient, stops as mk
    from vello_tpu.text import default_font, layout_text

    rng = np.random.default_rng(seed)
    f = default_font()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(),
           Gradient.linear((0, 0), (96, 96),
                           mk(COLORS[0], COLORS[3]), Extend.PAD),
           None, rect_path(0, 0, 96, 96))
    if rng.random() < 0.5:
        s.push_clip_layer(Affine.identity(),
                          circle_path(48, 48, float(rng.uniform(28, 46))))
    if rng.random() < 0.5:
        s.push_blur_layer(float(rng.uniform(0.5, 2.5)))
    else:
        s.push_drop_shadow_layer(2, 2, 1.0, COLORS[5].with_alpha(0.5))
    (s.draw_glyphs(f).font_size(float(rng.uniform(10, 18)))
     .brush(COLORS[int(rng.integers(0, 6))])
     .raster(bool(rng.random() < 0.5))
     .draw(Fill.NON_ZERO, layout_text(f, 14, "Fz gj Q", (4, 40))))
    s.fill(Fill.EVEN_ODD, Affine.rotate_about(0.3, 48, 48),
           COLORS[int(rng.integers(0, 6))].with_alpha(0.6), None,
           circle_path(48, 60, 20))
    s.pop_layer()
    while s._layer_depth > 0:
        s.pop_layer()
    params = RenderParams(96, 96, base_color=(1, 1, 1, 1))
    a = OracleRenderer().render(s, params)
    b = Renderer().render(s, params)
    d = np.abs(a.astype(np.float64) - b)
    assert d.mean() < 1e-3, d.mean()
    assert (d.max(axis=-1) > 0.05).sum() < 20


@pytest.mark.parametrize("seed", [5, 9])
def test_fuzz_culling_with_offscreen_clipping(seed):
    """Fragment culling under heavy viewport clipping: the est_live bound
    must hold (no retries) for long thin shapes crossing every edge, and
    pixels must match the oracle."""
    from vello_tpu.models.renderer import Renderer as R

    rng = np.random.default_rng(seed)
    s = Scene()
    for i in range(8):
        p = BezPath()
        pts = rng.uniform(-200, 712, (3, 2))
        p.move_to(*pts[0])
        p.line_to(*pts[1])
        p.line_to(*(pts[1] + rng.uniform(2, 6, 2)))
        p.close()
        s.fill(Fill.NON_ZERO, Affine.identity(),
               COLORS[i % 6].with_alpha(0.5), None, p)
        p2 = BezPath()
        p2.move_to(*pts[2])
        p2.curve_to(*rng.uniform(-200, 712, 6))
        s.stroke(Stroke(width=2.0), Affine.identity(), COLORS[(i + 3) % 6],
                 None, p2)
    params = RenderParams(512, 512, base_color=(0, 0, 0, 1))
    r = R()
    b = r.render(s, params)
    assert r.last_profile["n_live"] > 0, "culling did not engage"
    assert r.last_profile["retries"] == 0, "est_live bound violated"
    a = OracleRenderer().render(s, params)
    d = np.abs(a.astype(np.float64) - b)
    assert d.mean() < 5e-4
    assert (d.max(axis=-1) > 0.05).sum() < 20


@pytest.mark.parametrize("seed", [0, 3])
def test_random_scene_msaa_vs_xla_reference(seed):
    """Randomized scenes through the msaa16 device pipeline vs the XLA
    reference formulation (VELLO_TPU_SUPERSAMPLE_MSAA exercises the
    fallback separately): device msaa must be finite, bounded, and agree
    with the oracle's supersampled msaa within sample-position error."""
    rng = np.random.default_rng(seed)
    s = Scene()
    for i in range(5):
        path = random_path(rng)
        rule = Fill.NON_ZERO if rng.random() < 0.5 else Fill.EVEN_ODD
        c = COLORS[i % 6].with_alpha(float(rng.uniform(0.4, 1.0)))
        s.fill(rule, Affine.identity(), c, None, path)
    params = RenderParams(64, 64, antialiasing="msaa16")
    img = np.asarray(Renderer().render(s, params))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5
    area = np.asarray(Renderer().render(s, RenderParams(64, 64)))
    # msaa vs area differ only at edges: mean difference stays small
    assert np.abs(img - area).mean() < 0.02


@pytest.mark.parametrize("seed", [1])
def test_random_scene_lowp_close_to_quality(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    for i in range(5):
        c = COLORS[i % 6].with_alpha(float(rng.uniform(0.4, 1.0)))
        s.fill(Fill.NON_ZERO, Affine.identity(), c, None, random_path(rng))
    q = np.asarray(Renderer().render(s, RenderParams(64, 64)))
    f = np.asarray(Renderer().render(
        s, RenderParams(64, 64, render_mode="speed")))
    assert np.abs(q - f).max() <= 3.0 / 255.0
