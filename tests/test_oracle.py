"""Oracle renderer validation against the brute-force supersampler, plus
encoding round-trip checks."""

import numpy as np
import pytest

from vello_tpu import Affine, BezPath, Color, Fill, RenderParams, Scene
from vello_tpu.encoding.encoding import decode_segments
from vello_tpu.kurbo import circle_path, rect_path, star_path
from vello_tpu.oracle.renderer import (OracleRenderer, accumulate_winding,
                                       apply_fill_rule, flatten_decoded)
from vello_tpu.peniko import palette

from supersample import supersample_coverage


def coverage_of_scene(scene, w, h, path=0, rule=int(Fill.NON_ZERO)):
    from vello_tpu.encoding.resolve import resolve
    rs = resolve(scene.encoding, RenderParams(w, h))
    decoded = decode_segments(rs.tags, rs.data, rs.transforms, rs.styles)
    lines, line_path = flatten_decoded(decoded)
    sel = line_path == path
    return lines[sel], apply_fill_rule(
        accumulate_winding(lines[sel], w, h), rule)


def test_encoding_roundtrip_triangle():
    scene = Scene()
    p = BezPath().move_to(10, 10).line_to(50, 12).line_to(30, 40).close()
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None, p)
    tags, data, transforms, styles = scene.encoding.packed_streams()
    d = decode_segments(tags, data, transforms, styles)
    assert d["n_paths"] == 1
    assert len(d["kind"]) == 3  # three edges (close connects back)
    # Each segment is a line whose start equals the previous end.
    pts = d["points"]
    assert np.allclose(pts[0, 0], [10, 10])
    assert np.allclose(pts[0, 1], [50, 12])
    assert np.allclose(pts[1, 0], [50, 12])
    assert np.allclose(pts[2, 1], [10, 10])


def test_encoding_two_subpaths_share_nothing():
    scene = Scene()
    p = BezPath()
    p.move_to(0, 0).line_to(10, 0).line_to(10, 10).close()
    p.move_to(20, 20).line_to(30, 20).line_to(30, 30).close()
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None, p)
    tags, data, transforms, styles = scene.encoding.packed_streams()
    d = decode_segments(tags, data, transforms, styles)
    assert len(d["kind"]) == 6
    assert np.allclose(d["points"][3, 0], [20, 20])


def test_circle_coverage_vs_supersample():
    scene = Scene()
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
               circle_path(32, 32, 20))
    lines, cov = coverage_of_scene(scene, 64, 64)
    ref = supersample_coverage(lines, 64, 64, ss=8)
    assert np.abs(cov - ref).mean() < 0.01
    assert np.abs(cov - ref).max() < 0.1
    # area sanity: pi r^2, minus chord-flattening deficit (~tol * perimeter)
    assert abs(cov.sum() - np.pi * 400) < 25.0


def test_star_evenodd_vs_supersample():
    scene = Scene()
    p = star_path(32, 32, 5, 10, 28)
    scene.fill(Fill.EVEN_ODD, Affine.identity(), palette.RED, None, p)
    lines, cov = coverage_of_scene(scene, 64, 64, rule=int(Fill.EVEN_ODD))
    ref = supersample_coverage(lines, 64, 64, rule=int(Fill.EVEN_ODD), ss=8)
    assert np.abs(cov - ref).mean() < 0.01


def test_transformed_rect_coverage():
    scene = Scene()
    t = Affine.rotate_about(0.3, 32, 32) @ Affine.scale(1.2, 0.8)
    scene.fill(Fill.NON_ZERO, t, palette.RED, None, rect_path(10, 20, 50, 44))
    lines, cov = coverage_of_scene(scene, 64, 64)
    ref = supersample_coverage(lines, 64, 64, ss=8)
    assert np.abs(cov - ref).mean() < 0.01


def test_offleft_geometry_winds_into_viewport():
    scene = Scene()
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
               rect_path(-100, 10, 30, 50))
    lines, cov = coverage_of_scene(scene, 64, 64)
    assert np.allclose(cov[30, 0:29], 1.0)
    assert np.allclose(cov[5], 0.0)


def test_render_solid_over_base():
    scene = Scene()
    scene.fill(Fill.NON_ZERO, Affine.identity(),
               Color(0.0, 1.0, 0.0, 0.5), None, rect_path(0, 0, 32, 64))
    img = OracleRenderer().render(
        scene, RenderParams(64, 64, base_color=(1, 0, 0, 1)))
    # left half: 50% green over red
    assert np.allclose(img[32, 10], [0.5, 0.5, 0.0, 1.0], atol=1e-5)
    assert np.allclose(img[32, 50], [1.0, 0.0, 0.0, 1.0], atol=1e-5)


def test_stroke_produces_ring():
    from vello_tpu.kurbo import Stroke
    scene = Scene()
    scene.stroke(Stroke(width=6), Affine.identity(), palette.BLUE, None,
                 circle_path(32, 32, 20))
    img = OracleRenderer().render(
        scene, RenderParams(64, 64, base_color=(0, 0, 0, 1)))
    # On the circle: blue. At center and far outside: black.
    assert img[32, 32 + 20, 2] > 0.9
    assert img[32, 32, 2] < 0.1
    assert img[2, 2, 2] < 0.1


def test_clip_layer():
    scene = Scene()
    scene.push_clip_layer(Affine.identity(), circle_path(32, 32, 16))
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.LIME, None,
               rect_path(0, 0, 64, 64))
    scene.pop_layer()
    img = OracleRenderer().render(
        scene, RenderParams(64, 64, base_color=(0, 0, 0, 1)))
    assert img[32, 32, 1] > 0.9     # inside clip: green
    assert img[2, 2, 1] < 0.05      # outside clip: base
