"""Fine rasterization + compositing, XLA formulation.

The reference's ``fine.wgsl`` interprets a per-tile command list (PTCL) with a
blend stack. The TPU formulation is data-parallel over *fragments* (one per
path x touched-tile, the reference's ``Tile`` records): per-pixel exact-area
winding (same closed-form as fine.wgsl:1005-1060), fill rule, paint
evaluation, then source-over compositing by *transmittance*: since
premultiplied src-over composition of fragments f_1..f_n over a tile is
    out = sum_i src_i * prod_{j>i} (1 - a_j),
the ordered blend becomes a segmented suffix-sum of log(1-a) plus one
segment-sum — pure cumsum/exp/scatter, no sequential loop and no PTCL.
Non-src-over blends and clip layers take the layered path (pipeline/render).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..encoding.config import TILE_H, TILE_W
from ..encoding.resolve import (PAINT_BLUR_RECT, PAINT_COLOR, PAINT_GRADIENT,
                                PAINT_IMAGE)
from . import blur as blur_ops
from .paint import apply_extend_dynamic, linear_t, radial_t, sweep_t


def coverage_delta(seg, y_edge):
    """Per-pixel winding contribution of tile-local segments.

    seg: (N, 4) tile-local (x0,y0,x1,y1) in original orientation.
    y_edge: (N,) left-edge crossing y (1e9 if none).
    Returns (N, TILE_H, TILE_W) f32. Same math as fine.wgsl fill_path.
    """
    n = seg.shape[0]
    px = jax.lax.broadcasted_iota(jnp.float32, (1, TILE_H, TILE_W), 2)
    py = jax.lax.broadcasted_iota(jnp.float32, (1, TILE_H, TILE_W), 1)
    p0x = seg[:, 0][:, None, None]
    p0y = seg[:, 1][:, None, None]
    p1x = seg[:, 2][:, None, None]
    p1y = seg[:, 3][:, None, None]
    dx = p1x - p0x
    dy = p1y - p0y
    y = p0y - py
    y0 = jnp.clip(y, 0.0, 1.0)
    y1 = jnp.clip(y + dy, 0.0, 1.0)
    dyc = y0 - y1
    inv_dy = 1.0 / jnp.where(dy == 0.0, 1.0, dy)
    t0 = (y0 - y) * inv_dy
    t1 = (y1 - y) * inv_dy
    startx = p0x - px
    x0 = startx + t0 * dx
    x1 = startx + t1 * dx
    xmin = jnp.minimum(jnp.minimum(x0, x1), 1.0) - 1e-6
    xmax = jnp.maximum(x0, x1)
    b = jnp.minimum(xmax, 1.0)
    c = jnp.maximum(b, 0.0)
    d = jnp.maximum(xmin, 0.0)
    a = (b + 0.5 * (d * d - c * c) - xmin) / (xmax - xmin)
    area = jnp.where(dyc != 0.0, a * dyc, 0.0)
    ye = y_edge[:, None, None]
    area = area + jnp.sign(dx) * jnp.clip(py - ye + 1.0, 0.0, 1.0)
    return area


def apply_fill_rule(winding, rule):
    """rule: (N,1,1) i32 (0 nonzero, 1 evenodd)."""
    nz = jnp.minimum(jnp.abs(winding), 1.0)
    eo = jnp.abs(winding - 2.0 * jnp.round(0.5 * winding))
    return jnp.where(rule == 1, eo, nz)


def eval_paints(tile_px, tile_py, paint_kind, color, grad_rec, paint_inv,
                image_rec, blur_rec, ramps, atlas, kinds_present):
    """Evaluate per-fragment paints.

    tile_px/tile_py: (N,) f32 tile origin in pixels. Per-path tables already
    gathered per fragment. kinds_present: static frozenset of paint kinds in
    the scene — branches for absent kinds are skipped at trace time.
    Returns (N, TILE_H, TILE_W, 4) premultiplied RGBA.
    """
    n = tile_px.shape[0]
    out = jnp.broadcast_to(color[:, None, None, :],
                           (n, TILE_H, TILE_W, 4))
    needs_xy = (PAINT_GRADIENT in kinds_present
                or PAINT_IMAGE in kinds_present
                or PAINT_BLUR_RECT in kinds_present)
    if not needs_xy:
        return out
    col = jax.lax.broadcasted_iota(jnp.float32, (1, TILE_H, TILE_W), 2)
    row = jax.lax.broadcasted_iota(jnp.float32, (1, TILE_H, TILE_W), 1)
    gx = tile_px[:, None, None] + col + 0.5
    gy = tile_py[:, None, None] + row + 0.5
    inv = paint_inv
    lx = gx * inv[:, 0, None, None] + gy * inv[:, 2, None, None] \
        + inv[:, 4, None, None]
    ly = gx * inv[:, 1, None, None] + gy * inv[:, 3, None, None] \
        + inv[:, 5, None, None]

    if PAINT_GRADIENT in kinds_present:
        g = grad_rec
        def f(k):
            return g[:, k][:, None, None]
        kindg = f(0)
        t_lin = linear_t(jnp, lx, ly, f(2), f(3), f(4), f(5))
        t_rad, valid_rad = radial_t(jnp, lx, ly, f(2), f(3), f(4), f(5),
                                    f(6), f(7))
        t_swp = sweep_t(jnp, lx, ly, f(2), f(3), f(8), f(9))
        t = jnp.where(kindg == 0, t_lin,
                      jnp.where(kindg == 1, t_rad, t_swp))
        valid = jnp.where(kindg == 1, valid_rad, True)
        t = apply_extend_dynamic(jnp, t, f(1).astype(jnp.int32))
        # multi-ramp sampling
        rw = ramps.shape[1]
        flat = ramps.reshape(-1, 4)
        xg = jnp.clip(t, 0.0, 1.0) * (rw - 1)
        i0 = jnp.clip(jnp.floor(xg).astype(jnp.int32), 0, rw - 2)
        frac = (xg - i0.astype(jnp.float32))[..., None]
        rowix = g[:, 10].astype(jnp.int32)[:, None, None]
        base_ix = rowix * rw + i0
        c0 = flat[base_ix]
        c1 = flat[base_ix + 1]
        cg = c0 * (1.0 - frac) + c1 * frac
        ag = cg[..., 3:4]
        grad_rgba = jnp.concatenate([cg[..., :3] * ag, ag], axis=-1)
        grad_rgba = jnp.where(valid[..., None], grad_rgba, 0.0)
        out = jnp.where((paint_kind == PAINT_GRADIENT)[:, None, None, None],
                        grad_rgba, out)

    if PAINT_IMAGE in kinds_present:
        r = image_rec
        ax, ay = r[:, 0][:, None, None], r[:, 1][:, None, None]
        iw, ih = r[:, 2][:, None, None], r[:, 3][:, None, None]
        xe = r[:, 4].astype(jnp.int32)[:, None, None]
        ye_m = r[:, 5].astype(jnp.int32)[:, None, None]
        alpha = r[:, 7][:, None, None, None]
        sw = jnp.maximum(iw, 1.0)
        sh = jnp.maximum(ih, 1.0)
        ux = apply_extend_dynamic(jnp, (lx - 0.5) / sw, xe) * sw
        uy = apply_extend_dynamic(jnp, (ly - 0.5) / sh, ye_m) * sh
        ux = jnp.clip(ux, 0.0, sw - 1e-3)
        uy = jnp.clip(uy, 0.0, sh - 1e-3)
        xf = jnp.floor(ux)
        yf = jnp.floor(uy)
        fx = (ux - xf)[..., None]
        fy = (uy - yf)[..., None]
        aw = atlas.shape[1]
        aflat = atlas.reshape(-1, 4)
        x0i = (ax + xf).astype(jnp.int32)
        y0i = (ay + yf).astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, (ax + iw - 1).astype(jnp.int32))
        y1i = jnp.minimum(y0i + 1, (ay + ih - 1).astype(jnp.int32))
        c00 = aflat[y0i * aw + x0i]
        c01 = aflat[y0i * aw + x1i]
        c10 = aflat[y1i * aw + x0i]
        c11 = aflat[y1i * aw + x1i]
        img_rgba = ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
                    + (c10 * (1 - fx) + c11 * fx) * fy) * alpha
        out = jnp.where((paint_kind == PAINT_IMAGE)[:, None, None, None],
                        img_rgba, out)

    if PAINT_BLUR_RECT in kinds_present:
        br = blur_rec
        def fb(k):
            return br[:, k][:, None, None]
        cov = blur_ops.blurred_rounded_rect_coverage(
            jnp, lx, ly, fb(0), fb(1), fb(2), fb(3), fb(4), fb(5))
        blur_rgba = color[:, None, None, :] * cov[..., None]
        out = jnp.where((paint_kind == PAINT_BLUR_RECT)[:, None, None, None],
                        blur_rgba, out)
    return out


def composite_srcover(src, alpha, gtile, n_gtiles, base_color):
    """Transmittance-formulation ordered src-over composite.

    src: (N, H, W, 4) premultiplied fragment colors, SORTED by (gtile, order).
    alpha: (N, H, W) fragment alpha. gtile: (N,) sorted global tile ids
    (invalid = n_gtiles). Returns (n_gtiles, H, W, 4).
    """
    from .segmented import segment_suffix_sum_sorted, segment_sum_sorted
    w = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
    s = segment_suffix_sum_sorted(w, gtile)
    t = _transmittance(s)
    contrib = src * t[..., None]
    tiles = segment_sum_sorted(contrib, gtile, n_gtiles)
    w_tot = segment_sum_sorted(w, gtile, n_gtiles)
    t_tot = _transmittance(w_tot)
    return tiles + base_color[None, None, None, :] * t_tot[..., None]


def _transmittance(log_sum):
    """exp with a hard zero below the opacity threshold: a fragment with
    alpha >= 1-1e-7 must FULLY occlude (a 1e-9 leak flips discontinuous
    blend modes like color-dodge at cb==0)."""
    return jnp.where(log_sum <= -16.0, 0.0, jnp.exp(log_sum))


def composite_srcover_over(src, alpha, gtile, bg_tiles):
    """Same as composite_srcover but over an existing per-tile backdrop
    buffer (n_gtiles, H, W, 4) — the layered compositor's 'draws' op."""
    from .segmented import segment_suffix_sum_sorted, segment_sum_sorted
    n_gtiles = bg_tiles.shape[0]
    w = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
    s = segment_suffix_sum_sorted(w, gtile)
    t = _transmittance(s)
    tiles = segment_sum_sorted(src * t[..., None], gtile, n_gtiles)
    w_tot = segment_sum_sorted(w, gtile, n_gtiles)
    t_tot = _transmittance(w_tot)
    return tiles + bg_tiles * t_tot[..., None]
