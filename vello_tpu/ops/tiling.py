"""Device-side tiling: lines -> (line, tile) touches -> tile-local segments
and backdrop deltas. Replaces the reference's atomic/indirect trio
``path_count.wgsl`` / ``backdrop_dyn.wgsl`` / ``path_tiling.wgsl`` with a
fully-vectorised count -> cumsum -> expand -> scatter formulation:

* touch counts are closed-form (span arithmetic), so "bump allocation"
  becomes an exclusive scan + one searchsorted expansion;
* each touch independently recomputes its tile via the staircase closed form
  z(i) = floor(a*i + b) (the robust-epsilon construction guaranteeing
  floor-consistency across i follows the reference's published scheme,
  path_count.wgsl:36-92 — the invariant matters, the code is re-derived);
* backdrop deltas (winding crossing tile rows) become one scatter-add plus a
  segmented row prefix-sum, replacing atomicAdd + backdrop_dyn;
* per-tile segment lists come from one key sort (jax.lax.sort), replacing
  coarse's workgroup-shared-memory bitmaps.

Because flatten already clamps lines into the viewport, no bbox-clip branch
survives in this stage (the reference's imin/imax/ynext logic is vestigial
under that precondition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encoding.config import TILE_H, TILE_W
from .flatten import expand_by_counts

ONE_MINUS_ULP = 0.99999994
ROBUST_EPS = 2e-7
SEG_EPS = 1e-6


def _span(a, b):
    return jnp.maximum(jnp.ceil(jnp.maximum(a, b))
                       - jnp.floor(jnp.minimum(a, b)), 1.0)


def tile_alloc(path_rect, width_tiles, height_tiles):
    """Flat-tile allocation from host-computed per-path tile rects.

    The reference computes path bboxes with atomics in flatten.wgsl:831-923
    then allocates in tile_alloc.wgsl. On TPU the control-hull bbox is
    computed host-side by the resolver (conservative superset of the curve
    bbox, so every touch lands inside) and allocation is one cumsum here —
    no segment_min/max scatter on device.
    """
    tx0 = jnp.clip(path_rect[:, 0], 0, width_tiles)
    ty0 = jnp.clip(path_rect[:, 1], 0, height_tiles)
    tx1 = jnp.clip(path_rect[:, 2], tx0, width_tiles)
    ty1 = jnp.clip(path_rect[:, 3], ty0, height_tiles)
    w = tx1 - tx0
    h = ty1 - ty0
    areas = w * h
    incl = jnp.cumsum(areas)
    base = incl - areas
    return {
        "tx0": tx0, "ty0": ty0, "tx1": tx1, "ty1": ty1,
        "stride": w, "rows": h, "base": base, "areas": areas,
        "total_tiles": incl[-1] if len(areas) else jnp.int32(0),
    }


def path_tile_rects(lines, edge_lines, line_path, edge_path, n_paths_cap,
                    width_tiles, height_tiles):
    """Per-path clamped tile-space bounding rects + flat-tile allocation.

    Device-side variant using segment min/max (slow on TPU — kept for
    CPU-mesh use and as the reference implementation of tile_alloc's input).
    """
    allx = jnp.concatenate([lines[:, 0], lines[:, 2],
                            edge_lines[:, 0], edge_lines[:, 2]])
    ally = jnp.concatenate([lines[:, 1], lines[:, 3],
                            edge_lines[:, 1], edge_lines[:, 3]])
    allp = jnp.concatenate([line_path, line_path, edge_path, edge_path])
    allp = jnp.clip(allp, 0, n_paths_cap)  # invalid -> dump slot n_paths_cap
    big = jnp.float32(1e30)
    num = n_paths_cap + 1
    minx = jax.ops.segment_min(allx, allp, num_segments=num)
    miny = jax.ops.segment_min(ally, allp, num_segments=num)
    maxx = jax.ops.segment_max(allx, allp, num_segments=num)
    maxy = jax.ops.segment_max(ally, allp, num_segments=num)
    empty = minx > maxx  # segment_min of empty set = +inf
    tx0 = jnp.clip(jnp.floor(minx / TILE_W), 0, width_tiles).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(miny / TILE_H), 0, height_tiles).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(maxx / TILE_W) + 1, 0,
                   width_tiles).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(maxy / TILE_H) + 1, 0,
                   height_tiles).astype(jnp.int32)
    tx1 = jnp.maximum(tx1, tx0)
    ty1 = jnp.maximum(ty1, ty0)
    w = jnp.where(empty, 0, tx1 - tx0)[:n_paths_cap]
    h = jnp.where(empty, 0, ty1 - ty0)[:n_paths_cap]
    areas = w * h
    incl = jnp.cumsum(areas)
    base = incl - areas
    del big
    return {
        "tx0": tx0[:n_paths_cap], "ty0": ty0[:n_paths_cap],
        "tx1": tx1[:n_paths_cap], "ty1": ty1[:n_paths_cap],
        "stride": w, "rows": h, "base": base, "areas": areas,
        "total_tiles": incl[-1],
    }


def _dda_from_q(qx0, qy0, qx1, qy1):
    """Staircase parameters from downward-oriented endpoints. Deterministic
    f32 math: recomputing per touch from the gathered endpoints yields
    bit-identical results to the per-line computation, so only the four
    endpoints need to ride the touch-expansion gather."""
    sx0, sy0 = qx0 / TILE_W, qy0 / TILE_H
    sx1, sy1 = qx1 / TILE_W, qy1 / TILE_H
    count_x = _span(sx0, sx1) - 1.0
    count = count_x + _span(sy0, sy1)
    dx = jnp.abs(sx1 - sx0)
    dy = sy1 - sy0
    denom = dx + dy
    zero_len = denom == 0.0
    boundary_horiz = (dy == 0.0) & (jnp.floor(sy0) == sy0)
    idxdy = 1.0 / jnp.where(zero_len, 1.0, denom)
    a = dx * idxdy
    pos_slope = sx1 >= sx0
    sign_x = jnp.where(pos_slope, 1.0, -1.0)
    xt0 = jnp.floor(sx0 * sign_x)
    c = sx0 * sign_x - xt0
    y0i = jnp.floor(sy0)
    ytop = jnp.where(sy0 == sy1, jnp.ceil(sy0), y0i + 1.0)
    b = jnp.minimum((dy * c + dx * (ytop - sy0)) * idxdy, ONE_MINUS_ULP)
    # Robustness: force floor-consistency of the staircase at its last step.
    err = jnp.floor(a * (count - 1.0) + b) - count_x
    a = jnp.where(err != 0.0, a - ROBUST_EPS * jnp.sign(err), a)
    x0i = xt0 * sign_x + jnp.where(pos_slope, 0.0, -1.0)
    dead = zero_len | boundary_horiz
    return {
        "count": jnp.where(dead, 0.0, count), "a": a, "b": b,
        "sign_x": sign_x, "x0i": x0i, "y0i": y0i, "sy0": sy0,
        "pos_slope": pos_slope,
    }


def _dda_params(lines):
    """Per-line staircase parameters (downward-oriented)."""
    x0, y0, x1, y1 = lines[:, 0], lines[:, 1], lines[:, 2], lines[:, 3]
    is_down = y1 >= y0
    qx0 = jnp.where(is_down, x0, x1)
    qy0 = jnp.where(is_down, y0, y1)
    qx1 = jnp.where(is_down, x1, x0)
    qy1 = jnp.where(is_down, y1, y0)
    p = _dda_from_q(qx0, qy0, qx1, qy1)
    p["is_down"] = is_down
    p["q"] = (qx0, qy0, qx1, qy1)
    return p


def rect_pack(rects):
    """(P, 6) f32 rect-field matrix for gather-efficient expansion."""
    return jnp.stack([rects["tx0"].astype(jnp.float32),
                      rects["ty0"].astype(jnp.float32),
                      rects["tx1"].astype(jnp.float32),
                      rects["ty1"].astype(jnp.float32),
                      rects["stride"].astype(jnp.float32),
                      rects["base"].astype(jnp.float32)], axis=-1)


def make_touches(lines, line_path, rects, n_touch_cap, line_rect=None,
                 line_real=None, force_fused=None):
    """Expand lines into (line, tile) touch records.

    line_rect: optional (L, 6) per-line rect fields carried through the
    flatten expansion (saves an L-scale gather here).
    line_real: optional (L,) bool marking real (non-padding) line slots;
    when given and a TPU is attached, the fused Pallas expansion runs
    (dead real lines then cost one dump-tile dummy touch each — covered by
    the host estimator, whose per-line span bound is always >= 1).

    Returns per-touch: tile-local clipped segment (p0, p1, y_edge), flat
    tile id, backdrop delta, and validity.
    """
    p = _dda_params(lines)
    path = line_path
    valid_line = path < 2 ** 30
    if line_rect is not None:
        rrow = line_rect                             # (L, 6) precomputed
    else:
        pclip = jnp.clip(path, 0, len(rects["tx0"]) - 1)
        rrow = rect_pack(rects)[pclip]               # (L, 6)
    # Drop verticals exactly on the path's right tile boundary (their winding
    # falls outside the bbox — see path_count.wgsl xmin >= bbox.z).
    sx_min = jnp.minimum(lines[:, 0], lines[:, 2]) / TILE_W
    on_right = sx_min >= rrow[:, 2]
    live = valid_line & ~on_right & (rrow[:, 4] > 0)
    counts = jnp.where(live, p["count"], 0.0).astype(jnp.int32)

    from .pallas_kernels import BLK_X, use_pallas
    fused_ok = line_real is not None and n_touch_cap % BLK_X == 0
    if fused_ok and (use_pallas() if force_fused is None else force_fused):
        from .pallas_kernels import interpret_default
        return _make_touches_fused(p, live, line_real, counts, rrow,
                                   n_touch_cap,
                                   interpret=(interpret_default()
                                              or not use_pallas()))
    offs = (jnp.cumsum(counts) - counts).astype(jnp.float32)

    qx0l, qy0l, qx1l, qy1l = p["q"]
    # Everything a touch needs from its line, in ONE narrow row gather:
    # DDA parameters are recomputed per touch from the endpoints
    # (bit-identical, see _dda_from_q) so only 12 fields ride the gather.
    lpack = jnp.concatenate([
        jnp.stack([qx0l, qy0l, qx1l, qy1l, offs,
                   jnp.where(p["is_down"], 1.0, -1.0)], axis=-1),
        rrow,
    ], axis=-1)                                      # (L, 12)

    lix, i, tvalid, total = expand_by_counts(counts, n_touch_cap)
    overflow = (total > n_touch_cap).astype(jnp.int32)
    row = lpack[lix]                                 # (T, 12)
    qx0, qy0, qx1, qy1 = row[:, 0], row[:, 1], row[:, 2], row[:, 3]
    down = row[:, 5] > 0
    tx0 = row[:, 6].astype(jnp.int32)
    ty0 = row[:, 7].astype(jnp.int32)
    tx1 = row[:, 8].astype(jnp.int32)
    ty1 = row[:, 9].astype(jnp.int32)
    stride = row[:, 10].astype(jnp.int32)
    base = row[:, 11].astype(jnp.int32)
    d = _dda_from_q(qx0, qy0, qx1, qy1)
    a, b = d["a"], d["b"]
    x0i_f, y0i_f, sy0 = d["x0i"], d["y0i"], d["sy0"]
    sign_x = d["sign_x"]
    count = d["count"]
    pos = d["pos_slope"]

    fi = i.astype(jnp.float32)
    z = jnp.floor(a * fi + b)
    x = (x0i_f + sign_x * z).astype(jnp.int32)
    y = (y0i_f + fi - z).astype(jnp.int32)
    # Clamp into the path rect (numerical safety; by construction inside).
    x = jnp.clip(x, tx0, tx1 - 1)
    y = jnp.clip(y, ty0, ty1 - 1)
    ftile = base + (y - ty0) * stride + (x - tx0)
    ftile = jnp.where(tvalid, ftile, 2 ** 30)

    # --- backdrop: does this touch enter through its tile's top edge? ---
    # The delta targets tile (y, x+1) == ftile + 1, so after the touch sort
    # the deltas are ALSO sorted by target tile (shifted by one segment) and
    # accumulate in the same fused segment-sum as coverage — no extra sort,
    # no scatter (replaces path_count's atomicAdd entirely).
    z_prev = jnp.floor(a * (fi - 1.0) + b)
    top_edge = jnp.where(i == 0, jnp.floor(sy0) == sy0, z == z_prev)
    delta = jnp.where(down, -1.0, 1.0)
    b_ok = tvalid & top_edge & (x + 1 < tx1)
    backdrop_val = jnp.where(b_ok, delta, 0.0)

    # --- clip the segment to the tile (path_tiling logic, vectorised) ---
    tile_x = x.astype(jnp.float32) * TILE_W
    tile_y = y.astype(jnp.float32) * TILE_H
    tile_x1 = tile_x + TILE_W
    tile_y1 = tile_y + TILE_H
    dxl = qx1 - qx0
    dyl = qy1 - qy0
    inv_dyl = 1.0 / jnp.where(dyl == 0, 1.0, dyl)
    inv_dxl = 1.0 / jnp.where(dxl == 0, 1.0, dxl)

    # entry clip (i > 0)
    z_same_prev = z == z_prev
    xt_top = qx0 + dxl * (tile_y - qy0) * inv_dyl
    xt_top = jnp.clip(xt_top, tile_x + 1e-3, tile_x1)
    x_clip_e = jnp.where(pos, tile_x, tile_x1)
    yt_side = qy0 + dyl * (x_clip_e - qx0) * inv_dxl
    yt_side = jnp.clip(yt_side, tile_y + 1e-3, tile_y1)
    ex = jnp.where(z_same_prev, xt_top, x_clip_e)
    ey = jnp.where(z_same_prev, tile_y, yt_side)
    px0 = jnp.where(i > 0, ex, qx0)
    py0 = jnp.where(i > 0, ey, qy0)

    # exit clip (i < count - 1)
    z_next = jnp.floor(a * (fi + 1.0) + b)
    z_same_next = z == z_next
    xt_bot = qx0 + dxl * (tile_y1 - qy0) * inv_dyl
    xt_bot = jnp.clip(xt_bot, tile_x + 1e-3, tile_x1)
    x_clip_x = jnp.where(pos, tile_x1, tile_x)
    yt_side2 = qy0 + dyl * (x_clip_x - qx0) * inv_dxl
    yt_side2 = jnp.clip(yt_side2, tile_y + 1e-3, tile_y1)
    lx = jnp.where(z_same_next, xt_bot, x_clip_x)
    ly = jnp.where(z_same_next, tile_y1, yt_side2)
    last = fi >= count - 1.0
    px1 = jnp.where(last, qx1, lx)
    py1 = jnp.where(last, qy1, ly)

    # tile-local coords + robustness rules (path_tiling.wgsl:129-168)
    p0x = px0 - tile_x
    p0y = py0 - tile_y
    p1x = px1 - tile_x
    p1y = py1 - tile_y
    y_edge = jnp.full_like(p0x, 1e9)
    eps = SEG_EPS
    both0 = (p0x == 0.0) & (p1x == 0.0)
    entire = both0 & (p0y == 0.0)
    vanish = both0 & (p0y != 0.0)
    p0_only = (p0x == 0.0) & (p1x != 0.0)
    y_edge = jnp.where(p0_only & (p0y != 0.0), p0y, y_edge)
    y_edge = jnp.where((p1x == 0.0) & ~both0 & (p1y != 0.0), p1y, y_edge)
    p0x = jnp.where(both0 | (p0_only & (p0y == 0.0)), eps, p0x)
    p1x = jnp.where(entire, eps, jnp.where(vanish, 2 * eps, p1x))
    p1y = jnp.where(entire, float(TILE_H), jnp.where(vanish, p0y, p1y))
    p1x = jnp.where((p1x == 0.0) & (p1y == 0.0) & ~both0, eps, p1x)
    # no pixel-grid-aligned interior verticals (fine denominator guard).
    on_grid0 = (p0x == jnp.floor(p0x)) & (p0x != 0.0)
    on_grid1 = (p1x == jnp.floor(p1x)) & (p1x != 0.0)
    p0x = jnp.where(on_grid0, p0x - eps, p0x)
    p1x = jnp.where(on_grid1, p1x - eps, p1x)
    # restore original orientation
    s0x = jnp.where(down, p0x, p1x)
    s0y = jnp.where(down, p0y, p1y)
    s1x = jnp.where(down, p1x, p0x)
    s1y = jnp.where(down, p1y, p0y)

    seg = jnp.stack([s0x, s0y, s1x, s1y], axis=-1).astype(jnp.float32)
    seg = jnp.where(tvalid[:, None], seg, 0.0)
    return {
        "ftile": ftile.astype(jnp.int32),
        "seg": seg,
        "y_edge": jnp.where(tvalid, y_edge, 1e9).astype(jnp.float32),
        "valid": tvalid,
        "backdrop_val": backdrop_val.astype(jnp.float32),
        "overflow": overflow,
    }


def _make_touches_fused(p, live, line_real, counts, rrow, n_touch_cap,
                        interpret=False):
    """Fused Pallas touch expansion (see pallas_kernels.expand_touches_pallas).

    Every line_real slot emits >= 1 touch (dead ones one dump dummy), which
    bounds the per-block line window and removes both expansion sorts and
    the per-touch line-field gather.

    PRECONDITION (window invariant): non-producing slots (line_real False)
    must only appear as TRAILING padding — any >WIN_X-256 run of dead slots
    between producers silently drops the later producers' touches. Callers
    concatenating regions put the small region first and mark all its slots
    line_real=True (see prepare_fragments / make_touches_from_linepack)."""
    from .pallas_kernels import WIN_X, expand_touches_pallas, BLK_X

    live = live & (p["count"] > 0)
    counts = jnp.where(line_real, jnp.maximum(counts, 1), 0)
    incl = jnp.cumsum(counts)
    total = incl[-1]
    overflow = (total > n_touch_cap).astype(jnp.int32)
    offs = incl - counts
    qx0, qy0, qx1, qy1 = p["q"]
    zero = jnp.zeros_like(qx0)
    lpack = jnp.stack([
        qx0, qy0, qx1, qy1,
        jnp.where(p["is_down"], 1.0, -1.0),
        offs.astype(jnp.float32), incl.astype(jnp.float32),
        live.astype(jnp.float32),
        rrow[:, 0], rrow[:, 1], rrow[:, 2], rrow[:, 3], rrow[:, 4],
        rrow[:, 5], zero, zero], axis=0)             # (16, L)
    lpack = jnp.pad(lpack, ((0, 0), (0, WIN_X)))
    g = n_touch_cap // BLK_X
    qpos = jnp.arange(g, dtype=jnp.int32) * BLK_X
    s0 = jnp.searchsorted(incl, qpos, side="right").astype(jnp.int32)
    s0s = jnp.concatenate([(s0 // 128) * 128,        # DMA-aligned starts
                           total[None].astype(jnp.int32)])
    ftile, pay = expand_touches_pallas(lpack, s0s, n_touch_cap,
                                       interpret=interpret)
    return {"ftile": ftile, "pay": pay, "overflow": overflow}


def make_touches_from_linepack(linepack, total_lines, n_touch_cap,
                               n_edge_cap, interpret=None, has_edge=True):
    """Touch expansion from the fused flatten's (16, L) line pack.

    Edge verticals (left-viewport-boundary winding carriers) expand in XLA
    (E is n_lines/4 and usually nearly empty); mid lines come straight from
    the pack. Both feed the fused Pallas touch expansion.

    has_edge=False statically skips the edge expansion entirely (its two
    L-scale sorts were ~2 ms/frame at the mmark tier for scenes that never
    cross x=0); a device flag (overflow bit 32) catches a wrong host
    prediction and triggers a retry with the edge path enabled."""
    from .flatten import _EDGE_EPS, expand_by_counts
    from .pallas_kernels import (WIN_X, BLK_X, expand_touches_pallas,
                                 interpret_default)
    interpret = interpret_default() if interpret is None else interpret

    lnum = linepack.shape[1]
    if not has_edge:
        real_line = jnp.arange(lnum, dtype=jnp.int32) < total_lines
        ecount_seen = jnp.sum(jnp.where(real_line, linepack[7], 0.0))
        # reported as 16 here; render.py doubles overflow_edges, so the
        # renderer sees bit 32 = "edge verticals appeared with the edge
        # path statically disabled" and retries with has_edge=True
        edge_violation = 16 * (ecount_seen > 0).astype(jnp.int32)
        tcounts = jnp.where(real_line,
                            jnp.maximum(linepack[5], 1.0), 0.0
                            ).astype(jnp.int32)
        incl = jnp.cumsum(tcounts)
        total = incl[-1]
        overflow = (total > n_touch_cap).astype(jnp.int32)
        offs = (incl - tcounts).astype(jnp.float32)
        n_all = lnum
        lpack = jnp.concatenate([
            linepack[0:5], offs[None], incl.astype(jnp.float32)[None],
            linepack[6:7], linepack[10:16],
            jnp.zeros((2, n_all), jnp.float32)], axis=0)   # (16, L)
        lpack = jnp.pad(lpack, ((0, 0), (0, WIN_X)))
        g = n_touch_cap // BLK_X
        qpos = jnp.arange(g, dtype=jnp.int32) * BLK_X
        s0 = jnp.searchsorted(incl, qpos, side="right").astype(jnp.int32)
        s0s = jnp.concatenate([(s0 // 128) * 128,
                               total[None].astype(jnp.int32)])
        ftile, pay = expand_touches_pallas(lpack, s0s, n_touch_cap,
                                           interpret=interpret)
        return {"ftile": ftile, "pay": pay,
                "overflow": overflow, "overflow_edges": edge_violation}
    # --- edge verticals ---
    ecounts = linepack[7].astype(jnp.int32)
    eix, _, evalid, etotal = expand_by_counts(ecounts, n_edge_cap)
    overflow_edges = (etotal > n_edge_cap).astype(jnp.int32)
    esrc = linepack[8:16].T                               # (L, 8)
    erow = esrc[eix]
    ey0, ey1 = erow[:, 0], erow[:, 1]
    erect = erow[:, 2:8]
    lof = jnp.full_like(ey0, _EDGE_EPS)
    e_lines = jnp.stack([lof, ey0, lof, ey1], axis=-1)
    pe = _dda_params(e_lines)
    e_on_right = (_EDGE_EPS / TILE_W) >= erect[:, 2]
    e_live = evalid & ~e_on_right & (erect[:, 4] > 0) & (pe["count"] > 0)
    etcount = jnp.where(e_live, pe["count"], 0.0)
    eqx0, eqy0, eqx1, eqy1 = pe["q"]

    # --- concatenated touch counts ---
    # DENSITY INVARIANT: the expansion kernel's line window covers a touch
    # block only if every slot BEFORE the last producing slot emits >= 1
    # touch (window = BLK_X + 256 slots). Edges therefore go FIRST and
    # every edge slot (live or not) emits at least a dump dummy — the mid
    # region is a dense prefix by construction, so the only dead slots are
    # trailing padding. (A [mid | edges] order leaves an up-to-L-scale
    # dead gap between the regions and silently DROPS edge touches once
    # the gap exceeds the window slack.)
    real_line = jnp.arange(lnum, dtype=jnp.int32) < total_lines
    tc_l = jnp.where(real_line, jnp.maximum(linepack[5], 1.0), 0.0)
    tc_e = jnp.maximum(etcount, 1.0)
    tcounts = jnp.concatenate([tc_e, tc_l]).astype(jnp.int32)
    incl = jnp.cumsum(tcounts)
    total = incl[-1]
    overflow = (total > n_touch_cap).astype(jnp.int32)
    offs = (incl - tcounts).astype(jnp.float32)

    qrows = jnp.concatenate([
        jnp.stack([eqx0, eqy0, eqx1, eqy1,
                   jnp.where(pe["is_down"], 1.0, -1.0)], axis=0),
        linepack[0:5],
    ], axis=1)                                            # (5, E+L)
    liverow = jnp.concatenate([e_live.astype(jnp.float32),
                               linepack[6]])[None]
    rectrows = jnp.concatenate([erect.T, linepack[10:16]], axis=1)
    n_all = qrows.shape[1]
    lpack = jnp.concatenate([
        qrows, offs[None], incl.astype(jnp.float32)[None], liverow,
        rectrows, jnp.zeros((2, n_all), jnp.float32)], axis=0)  # (16, L+E)
    lpack = jnp.pad(lpack, ((0, 0), (0, WIN_X)))
    g = n_touch_cap // BLK_X
    qpos = jnp.arange(g, dtype=jnp.int32) * BLK_X
    s0 = jnp.searchsorted(incl, qpos, side="right").astype(jnp.int32)
    s0s = jnp.concatenate([(s0 // 128) * 128,
                           total[None].astype(jnp.int32)])
    ftile, pay = expand_touches_pallas(lpack, s0s, n_touch_cap,
                                       interpret=interpret)
    return {"ftile": ftile, "pay": pay,
            "overflow": overflow, "overflow_edges": overflow_edges}


def backdrop_prefix(backdrop_idx, backdrop_val, rects, n_tile_cap):
    """Accumulate backdrop deltas and prefix-sum along each tile row.

    Replaces path_count's atomicAdd + backdrop_dyn's per-row loop. The
    scatter-add is realised as sort + segmented sum (TPU scatter serializes).
    """
    from .segmented import scatter_sum_via_sort
    idx = jnp.clip(backdrop_idx, 0, n_tile_cap)
    acc = scatter_sum_via_sort(backdrop_val, idx, n_tile_cap)
    # Row starts: flat tile t belongs to path p = searchsorted(base_incl, t);
    # its row start is base[p] + row * stride[p].
    from .segmented import searchsorted_dense
    t = jnp.arange(n_tile_cap, dtype=jnp.int32)
    incl = rects["base"] + rects["areas"]
    pth = searchsorted_dense(incl, n_tile_cap, side="right")
    pth = jnp.clip(pth, 0, len(rects["base"]) - 1)
    base = rects["base"][pth]
    stride = jnp.maximum(rects["stride"][pth], 1)
    rel = t - base
    row_start = base + (rel // stride) * stride
    c = jnp.cumsum(acc)
    c_start = c[row_start]
    a_start = acc[row_start]
    # inclusive prefix within the row
    return c - c_start + a_start
