"""Device (in-frame) stroke expansion tests.

The device path uploads centerline cubics + per-path half-widths and the
flatten stage emits offset quads + bevel triangles (ops/flatten.py
``stroke_slot_line`` — the TPU formulation of the reference's in-frame
stroke expansion, vello_shaders/shader/flatten.wgsl:328-630).

Gates:
  * encoding round-trip (hw/join flags decode per segment)
  * device-expanded vs host-expanded stroke_batch renders (same scene)
  * an INDEPENDENT supersampled distance-field ground truth on a smooth
    tangent-continuous centerline (bevel ~= round there, caps masked)
  * degenerate inputs (repeated points, single segment, sharp turns)
  * the estimator's capacity bound holds (no overflow retries)
"""

import numpy as np
import pytest

from vello_tpu import RenderParams, Scene
from vello_tpu.encoding.encoding import decode_segments
from vello_tpu.kurbo import Affine, Stroke
from vello_tpu.models.renderer import Renderer

BEVEL = dict(join="bevel", start_cap="butt", end_cap="butt")


def _smooth_chain(n_seg=4, scale=1.0, y0=40.0):
    """Tangent-continuous cubic chain (C1 at joints): control points are
    mirrored across each joint, so bevel joins degenerate to no-ops and
    the stroke equals the round-join/round-cap distance field away from
    the two caps."""
    xs = 20 + 30 * np.arange(n_seg + 1) * scale
    ys = y0 + 18 * np.sin(np.arange(n_seg + 1) * 1.3) * scale
    p = np.stack([xs, ys], -1)
    tang = np.gradient(p, axis=0)
    out = [p[0]]
    for i in range(n_seg):
        out += [p[i] + tang[i] / 3.0, p[i + 1] - tang[i + 1] / 3.0,
                p[i + 1]]
    return np.asarray(out, np.float32)[None]           # (1, 1+3k, 2)


def _scene(pts, widths, expand, colors=None):
    s = Scene()
    st = Stroke(width=1.0, **BEVEL)
    n = pts.shape[0]
    if colors is None:
        colors = np.tile(np.array([[1, 0, 0, 1]], np.float32), (n, 1))
    s.stroke_batch(st, Affine.identity(), colors, pts,
                   widths=np.asarray(widths, np.float64), expand=expand)
    return s


def test_encode_stroke_batch_roundtrip():
    pts = _smooth_chain(3)
    s = _scene(pts, [6.0], "device")
    enc = s.encoding
    tags, data, transforms, styles = enc.packed_streams()
    dec = decode_segments(tags, data, transforms, styles,
                          style_hw=enc.style_hw_array())
    assert enc.n_paths == 1 and enc.n_path_segments == 3
    assert (dec["kind"] == 3).all()
    np.testing.assert_allclose(dec["hw"], 3.0)
    # joins between consecutive segments, none after the last
    np.testing.assert_array_equal(dec["join"], [1, 1, 0])
    # per-path widths produce distinct style entries
    s2 = _scene(np.concatenate([pts, pts + 50]), [6.0, 10.0], "device")
    hw2 = s2.encoding.style_hw_array()
    np.testing.assert_allclose(hw2, [3.0, 5.0])


def test_device_matches_host_expansion():
    rng = np.random.default_rng(7)
    chains = np.stack([_smooth_chain(4, y0=30)[0],
                       _smooth_chain(4, y0=80)[0]])
    chains += rng.uniform(-2, 2, chains.shape).astype(np.float32)
    widths = [7.0, 3.0]
    params = RenderParams(192, 128, base_color=(0, 0, 0, 1),
                          antialiasing="area")
    r = Renderer()
    img_d = r.render(_scene(chains, widths, "device"), params)
    assert r.last_profile["retries"] == 0
    img_h = r.render(_scene(chains, widths, "host"), params)
    d = np.abs(img_d - img_h).max(-1)
    # different outline approximations (uniform-t quads+bevels vs host
    # adaptive polyline offset): tiny mean, few boundary pixels diverge
    assert d.mean() < 0.005, d.mean()
    assert (d > 0.4).sum() <= 16, (d > 0.4).sum()


@pytest.mark.parametrize("aa", ["area", "msaa16"])
def test_device_stroke_groundtruth(aa):
    """Supersampled distance-field ground truth on a smooth centerline
    (independent of every expansion code path)."""
    from vello_tpu.kurbo import BezPath
    from tests.test_stroke_groundtruth import _distance_field_stroke

    pts = _smooth_chain(4)
    width = 9.0
    w, h = 176, 96
    path = BezPath()
    path.move_to(*pts[0, 0])
    for i in range(4):
        path.curve_to(*pts[0, 1 + 3 * i], *pts[0, 2 + 3 * i],
                      *pts[0, 3 + 3 * i])
    gt = _distance_field_stroke(path, width, w, h)   # round caps/joins
    params = RenderParams(w, h, base_color=(0, 0, 0, 1), antialiasing=aa)
    img = Renderer().render(_scene(pts, [width], "device"), params)
    got = img[..., 0]                                 # red channel = cov
    # mask the two cap disks (butt vs round differ there by design)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = np.ones((h, w), bool)
    for cx, cy in (pts[0, 0], pts[0, -1]):
        mask &= (xx - cx) ** 2 + (yy - cy) ** 2 > (width) ** 2
    diff = np.abs(got - gt)[mask]
    assert diff.mean() < 0.01, diff.mean()
    # no pixel deep inside/outside flips entirely
    assert (diff > 0.5).sum() <= 8, (diff > 0.5).sum()


def test_sharp_turns_and_degenerates():
    """Right-angle turns exercise both bevel orientations; repeated
    points produce zero-length minis that must vanish silently."""
    zig = np.array([[[20, 20], [30, 20], [50, 20], [60, 20],   # right
                     [60, 30], [60, 50], [60, 60],             # down
                     [50, 60], [30, 60], [20, 60]]], np.float32)  # left
    dup = np.array([[[90, 20], [90, 20], [90, 20], [90, 20],   # degenerate
                     [100, 30], [110, 50], [120, 60],
                     [120, 60], [120, 60], [120, 60]]], np.float32)
    pts = np.concatenate([zig, dup])
    params = RenderParams(144, 96, base_color=(0, 0, 0, 1),
                          antialiasing="area")
    r = Renderer()
    img = r.render(_scene(pts, [8.0, 6.0], "device"), params)
    assert r.last_profile["retries"] == 0
    # interior of each straight arm is fully covered (winding >= 1:
    # consistent piece orientation — a flipped bevel would cancel)
    assert img[20, 40, 0] > 0.99          # first arm interior
    assert img[40, 60, 0] > 0.99          # vertical arm
    # outer bevel corner at the right-angle turn is covered too
    assert img[23, 63, 0] > 0.5
    # nothing painted far from both strokes
    assert img[85, 20, 0] < 1e-3
    # the degenerate-prefix path still draws its real portion
    assert img[45, 108, 0] > 0.5


def test_single_segment_and_line_elevation():
    """One-cubic path; exact line-as-cubic elevation renders a clean
    axis-aligned bar of the right thickness."""
    p0, p1 = np.array([20.0, 32.0]), np.array([120.0, 32.0])
    pts = np.array([[p0, p0 + (p1 - p0) / 3, p0 + 2 * (p1 - p0) / 3, p1]],
                   np.float32)
    params = RenderParams(144, 64, base_color=(0, 0, 0, 1),
                          antialiasing="area")
    img = Renderer().render(_scene(pts, [10.0], "device"), params)
    col = img[:, 70, 0]
    assert col[32] > 0.99
    assert col[28] > 0.99 and col[36] > 0.99       # inside +-5 px
    assert col[26] < 0.02 and col[38] < 0.02       # outside
    # butt cap: nothing before the start point
    assert img[32, 17, 0] < 0.02 and img[32, 123, 0] < 0.02


def test_mmark_uses_device_strokes():
    """The benchmark stroke scene now encodes centerlines, not outlines:
    the segment count stays at element scale."""
    from vello_tpu.scenes.test_scenes import mmark
    s = mmark(1, 512.0)
    # ~1000 elements -> ~1000-3000 cubic segments (padding buckets), vs
    # ~100k+ outline segments under host expansion
    assert s.encoding.n_path_segments < 10_000
    assert any(h > 0 for h in s.encoding.style_hw)
    params = RenderParams(512, 288, base_color=(1, 1, 1, 1),
                          antialiasing="area")
    r = Renderer()
    img = r.render(s, params)
    assert r.last_profile["retries"] == 0
    assert img[..., 3].max() > 0.99
