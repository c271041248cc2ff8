"""Pathological-segment flatten cap (MAX_LINES_PER_SEG tiering).

Round-4 verdict: a single huge cubic whose Wang count exceeds the default
MAX_LINES_PER_SEG=64 cap silently rendered coarser than the 0.25 px
flatten-tolerance contract. The resolver now raises the frame's cap to
the next power of two covering the unclamped Wang bound
(encoding/host_flatten.py::required_max_lines), threads it through
ResolvedScene.max_lines -> PipelineStatic.max_lines -> the device flatten,
and the host/oracle flatten auto-raises from the same bound — so the
tolerance holds instead of coarsening. The reference never hits this case
(its Euler-spiral flattening is fully adaptive, flatten.wgsl:328-492);
this is the capacity-tier analog.
"""

import numpy as np

from vello_tpu import Fill, RenderParams, Scene
from vello_tpu.encoding.config import FLATTEN_TOL, MAX_LINES_PER_SEG
from vello_tpu.encoding.host_flatten import (elevate_to_cubic,
                                             flatten_decoded,
                                             required_max_lines)
from vello_tpu.encoding.resolve import resolve
from vello_tpu.kurbo import Affine, BezPath
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import palette

# One violent cubic: control points whip far outside the hull so the
# second-difference (Wang) bound demands ~100 subdivisions at tol=0.25.
P0, P1, P2, P3 = (20.0, 256.0), (500.0, -800.0), (20.0, 1300.0), (490.0, 256.0)


def _decoded_one_cubic():
    pts = np.zeros((1, 4, 2), np.float64)
    pts[0] = [P0, P1, P2, P3]
    return {
        "points": pts,
        "kind": np.array([3], np.int32),
        "transform": np.array([[1, 0, 0, 1, 0, 0]], np.float64),
        "path_ix": np.array([0], np.int32),
        "n_paths": 1,
        "hw": np.zeros(1, np.float64),
        "join": np.zeros(1, np.int32),
    }


def _max_deviation(lines):
    """Max distance from the true cubic to the emitted polyline: uniform-t
    flatten means vertex j sits ON the curve at t=j/n, so the deviation is
    the curve-to-chord distance, densely sampled inside each chord."""
    n = len(lines)
    c = np.array([P0, P1, P2, P3], np.float64)
    worst = 0.0
    ts = (np.arange(n)[:, None] + np.linspace(0, 1, 33)[None, :]) / n
    t = ts.reshape(-1, 1)
    mt = 1.0 - t
    p = (mt ** 3 * c[0] + 3 * mt * mt * t * c[1]
         + 3 * mt * t * t * c[2] + t ** 3 * c[3]).reshape(n, 33, 2)
    a = lines[:, None, 0:2].astype(np.float64)
    b = lines[:, None, 2:4].astype(np.float64)
    ab = b - a
    l2 = np.maximum((ab ** 2).sum(-1), 1e-30)
    u = np.clip(((p - a) * ab).sum(-1) / l2, 0.0, 1.0)
    proj = a + u[..., None] * ab
    worst = np.sqrt(((p - proj) ** 2).sum(-1)).max()
    return float(worst)


def test_required_max_lines_detects_pathological():
    dec = _decoded_one_cubic()
    cub = elevate_to_cubic(dec["points"], dec["kind"])
    need = required_max_lines(cub, dec["kind"], FLATTEN_TOL)
    assert need > MAX_LINES_PER_SEG           # the default cap WOULD coarsen
    assert need & (need - 1) == 0             # power-of-two tier (compile key)
    # a tame segment keeps the default
    tame = np.array([[[0, 0], [10, 5], [20, 5], [30, 0]]], np.float64)
    assert required_max_lines(tame, dec["kind"], FLATTEN_TOL) \
        == MAX_LINES_PER_SEG


def test_flatten_tolerance_held_with_raised_cap():
    dec = _decoded_one_cubic()
    lines, _ = flatten_decoded(dec)           # auto-raises the cap
    dev = _max_deviation(lines)
    assert dev <= FLATTEN_TOL * 1.05, f"deviation {dev:.4f} px"
    # prove the test bites: the OLD behavior (hard 64 cap) violates the
    # tolerance on this segment
    n64 = MAX_LINES_PER_SEG
    t = np.arange(n64 + 1, dtype=np.float64)[:, None] / n64
    mt = 1.0 - t
    c = np.array([P0, P1, P2, P3], np.float64)
    v = mt ** 3 * c[0] + 3 * mt * mt * t * c[1] \
        + 3 * mt * t * t * c[2] + t ** 3 * c[3]
    coarse = np.concatenate([v[:-1], v[1:]], -1).astype(np.float32)
    assert _max_deviation(coarse) > FLATTEN_TOL


def test_pathological_cubic_end_to_end():
    p = BezPath()
    p.move_to(*P0)
    p.curve_to(*P1, *P2, *P3)
    p.close()
    s = Scene()
    s.fill(Fill.NON_ZERO, Affine.identity(), palette.REBECCA_PURPLE, None, p)
    params = RenderParams(512, 512, base_color=(0, 0, 0, 0),
                          antialiasing="area")
    rs = resolve(s.encoding, params)
    assert rs.max_lines > MAX_LINES_PER_SEG   # the resolver raised the cap
    r = Renderer()
    dev = np.asarray(r.render(s, params))
    assert r.last_profile.get("retries", 0) == 0
    orc = np.asarray(OracleRenderer().render(s, params))
    d = np.abs(dev - orc)
    assert d.mean() < 0.003, f"device vs oracle mean {d.mean():.5f}"
