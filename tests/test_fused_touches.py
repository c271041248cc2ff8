"""Bit-exactness of the fused Pallas touch expansion vs the XLA path.

The fused kernel (ops/pallas_kernels.expand_touches_pallas) replaces
expand_by_counts + the per-touch line-field gather + the DDA/tile-clip
fusions (the path_count/path_tiling pair, reference
``vello_shaders/shader/path_count.wgsl`` / ``path_tiling.wgsl``). Its live
touch multiset must match the XLA formulation exactly — same ftile, same
tile-local clipped segment, same y_edge and backdrop delta bits.

Runs the kernel in interpret mode on CPU (one grid block); the real-TPU
equivalence at mmark scale was verified on-device and is re-exercised by
every benched frame.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.encoding.config import TILE_H, TILE_W
from vello_tpu.encoding.resolve import resolve
from vello_tpu.kurbo import circle_path, star_path
from vello_tpu.models.renderer import pack_buffers
from vello_tpu.ops import flatten as flatten_ops, pathtag, tiling
from vello_tpu.peniko import palette


def _touch_rows(scene, size):
    params = RenderParams(size, size, base_color=(0, 0, 0, 1))
    rs = resolve(scene.encoding, params)
    caps = rs.capacities(params)
    bufs = {k: jnp.asarray(np.asarray(v))
            for k, v in pack_buffers(rs, caps, params).items()}
    wt = (size + TILE_W - 1) // TILE_W + 1
    ht = (size + TILE_H - 1) // TILE_H
    decoded = pathtag.decode_and_transform(
        bufs["tags"], bufs["data"], bufs["transforms"], bufs["styles"],
        data4=bufs.get("data4"))
    rects = tiling.tile_alloc(bufs["path_rect"], wt, ht)
    n_edge = caps.n_edges
    fl = flatten_ops.flatten(decoded, caps.n_lines, n_edge,
                             float(wt * TILE_W), float(size),
                             rpack=tiling.rect_pack(rects))
    # Edges first + always-producing: the fused expansion's density
    # precondition (see tiling._make_touches_fused).
    ones_e = jnp.ones(fl["edge_lines"].shape[0], bool)
    lines = jnp.concatenate([fl["edge_lines"], fl["lines"]], axis=0)
    lpath = jnp.concatenate([fl["edge_path"], fl["line_path"]], axis=0)
    lrect = jnp.concatenate([fl["edge_rect"], fl["line_rect"]], axis=0)
    lreal = jnp.concatenate([ones_e, fl["line_real"]], axis=0)
    return lines, lpath, rects, lrect, lreal


def _live_rows_xla(t):
    f = np.asarray(t["ftile"])
    live = f < 2 ** 30
    return np.concatenate([
        f[live, None].astype(np.float64),
        np.asarray(t["seg"])[live].astype(np.float64),
        np.asarray(t["y_edge"])[live, None].astype(np.float64),
        np.asarray(t["backdrop_val"])[live, None].astype(np.float64),
    ], axis=1)


def _live_rows_fused(t):
    f = np.asarray(t["ftile"])
    live = f < 2 ** 30
    pay = np.asarray(t["pay"]).T
    return np.concatenate([
        f[live, None].astype(np.float64),
        pay[live, :6].astype(np.float64),
    ], axis=1)


def _sorted(rows):
    return rows[np.lexsort(rows.T[::-1])]


def test_fused_flatten_geometry_matches_xla():
    """flatten_fused + make_touches_from_linepack (interpret mode) produce
    the same live-touch multiset as the XLA flatten + make_touches chain."""
    scene = Scene()
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
               circle_path(40, 40, 30))
    scene.fill(Fill.EVEN_ODD, Affine.translate(20, 60), palette.BLUE, None,
               star_path(30, 30, 5, 25, 10))
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.GREEN, None,
               circle_path(-20, 64, 30))
    size = 128
    params = RenderParams(size, size, base_color=(0, 0, 0, 1))
    rs = resolve(scene.encoding, params)
    caps = rs.capacities(params)
    bufs = {k: jnp.asarray(np.asarray(v))
            for k, v in pack_buffers(rs, caps, params).items()}
    wt = (size + TILE_W - 1) // TILE_W + 1
    ht = (size + TILE_H - 1) // TILE_H
    rects = tiling.tile_alloc(bufs["path_rect"], wt, ht)
    from vello_tpu.ops.pallas_kernels import BLK_F, BLK_X
    n_lines = BLK_F
    n_touch = BLK_X
    ff = flatten_ops.flatten_fused(
        bufs["seg_pts"], bufs["seg_kind"],
        bufs["seg_path"], bufs["n_segs"], n_lines,
        float(wt * TILE_W), float(size), tiling.rect_pack(rects),
        interpret=True)
    assert int(ff["overflow"]) == 0
    b = tiling.make_touches_from_linepack(
        ff["linepack"], ff["total_lines"], n_touch, 256, interpret=True)
    assert int(b["overflow"]) == 0

    lines, lpath, rects2, lrect, lreal = _touch_rows(scene, size)
    a = tiling.make_touches(lines, lpath, rects2, n_touch,
                            line_rect=lrect, line_real=None)
    ra = _sorted(_live_rows_xla(a))
    rb = _sorted(_live_rows_fused(b))
    assert ra.shape == rb.shape
    assert np.array_equal(ra[:, 0], rb[:, 0])
    assert np.array_equal(ra[:, 6], rb[:, 6])
    np.testing.assert_allclose(ra[:, 1:6], rb[:, 1:6], rtol=2e-6, atol=1e-5)


def test_fused_touch_expansion_bit_exact():
    scene = Scene()
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
               circle_path(40, 40, 30))
    scene.fill(Fill.EVEN_ODD, Affine.translate(20, 60), palette.BLUE, None,
               star_path(30, 30, 5, 25, 10))
    # off-screen geometry exercises the edge-vertical + dead-line dummies
    scene.fill(Fill.NON_ZERO, Affine.identity(), palette.GREEN, None,
               circle_path(-20, 64, 30))
    lines, lpath, rects, lrect, lreal = _touch_rows(scene, 128)
    from vello_tpu.ops.pallas_kernels import BLK_X
    cap = BLK_X  # one grid block is enough for this scene
    a = tiling.make_touches(lines, lpath, rects, cap, line_rect=lrect,
                            line_real=None)
    b = tiling.make_touches(lines, lpath, rects, cap, line_rect=lrect,
                            line_real=lreal, force_fused=True)
    assert "pay" in b, "fused path not taken"
    assert int(a["overflow"]) == 0 and int(b["overflow"]) == 0
    ra = _sorted(_live_rows_xla(a))
    rb = _sorted(_live_rows_fused(b))
    assert ra.shape == rb.shape
    # ftile and backdrop bits must match exactly; clipped coordinates may
    # differ by ~1 ulp in interpret mode only (XLA-CPU contracts a*b+c into
    # fma, the interpreted kernel doesn't; the real-TPU comparison at mmark
    # scale was bit-exact).
    assert np.array_equal(ra[:, 0], rb[:, 0])
    assert np.array_equal(ra[:, 6], rb[:, 6])
    np.testing.assert_allclose(ra[:, 1:6], rb[:, 1:6], rtol=2e-6, atol=1e-5)
