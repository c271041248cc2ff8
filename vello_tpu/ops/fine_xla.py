"""Fine rasterization + compositing, XLA formulation (channel-planar).

The reference's ``fine.wgsl`` interprets a per-tile command list (PTCL) with a
blend stack. The TPU formulation is data-parallel over *fragments* (one per
path x touched-tile, the reference's ``Tile`` records): per-pixel exact-area
winding (same closed-form as fine.wgsl:1005-1060), fill rule, paint
evaluation, then source-over compositing by *transmittance*: since
premultiplied src-over composition of fragments f_1..f_n over a tile is
    out = sum_i src_i * prod_{j>i} (1 - a_j),
the ordered blend becomes a segmented suffix-sum of log(1-a) plus one
segment-sum — pure cumsum/exp ops, no sequential loop and no PTCL.

LAYOUT: pixel data is kept as a flat 256-wide minor axis (the 16x16 tile) and
colors channel-planar (N, 4, 256) — a (...,16,16) or (...,4) minor dim would
waste 8-32x of every 8x128 VPU register tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encoding.config import TILE_H, TILE_W
from ..encoding.resolve import (PAINT_BLUR_RECT, PAINT_COLOR, PAINT_GRADIENT,
                                PAINT_IMAGE)
from . import blur as blur_ops
from .paint import apply_extend_dynamic, linear_t, radial_t, sweep_t
from .segmented import segment_suffix_sum_sorted, segment_sum_sorted

NPX = TILE_H * TILE_W  # 256 pixels per tile


def _pixel_iota():
    """(1, NPX) tile-local pixel corner coords (px, py)."""
    lin = jax.lax.broadcasted_iota(jnp.float32, (1, NPX), 1)
    px = jnp.mod(lin, TILE_W)
    py = jnp.floor(lin / TILE_W)
    return px, py


def coverage_delta(seg, y_edge):
    """Per-pixel winding contribution of tile-local segments.

    seg: (N, 4) tile-local (x0,y0,x1,y1) in original orientation.
    y_edge: (N,) left-edge crossing y (1e9 if none).
    Returns (N, NPX) f32. Same math as fine.wgsl fill_path.
    """
    px, py = _pixel_iota()
    p0x = seg[:, 0][:, None]
    p0y = seg[:, 1][:, None]
    p1x = seg[:, 2][:, None]
    p1y = seg[:, 3][:, None]
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
    ye = y_edge[:, None]
    area = area + jnp.sign(dx) * jnp.clip(py - ye + 1.0, 0.0, 1.0)
    return area


# D3D11 standard sample patterns (the reference builds its half-plane mask
# LUTs from these positions, vello_encoding/src/mask.rs:11,58); sample i
# sits at ((pat[i]+0.5)/n, (i+0.5)/n) within the pixel.
MSAA8_PATTERN = (0, 5, 3, 7, 1, 4, 6, 2)
MSAA16_PATTERN = (1, 8, 4, 11, 15, 7, 3, 12, 0, 9, 5, 13, 2, 10, 6, 14)


def sample_offsets(ns: int):
    pat = MSAA8_PATTERN if ns == 8 else MSAA16_PATTERN
    return [((pat[i] + 0.5) / ns, (i + 0.5) / ns) for i in range(ns)]


def coverage_delta_msaa(seg, y_edge, ns: int):
    """Per-SAMPLE winding deltas of tile-local segments (the sample-mask
    formulation of fine.wgsl fill_path_ms, reference fine.wgsl:146-511).

    Winding at a sample = signed count of segments crossing the leftward
    ray (crossing x < sample x, y-range half-open [ymin, ymax)), plus the
    left-edge y_edge correction — the point-sampled limit of the exact-area
    formula in coverage_delta, so backdrop deltas compose identically.

    seg (N, 4), y_edge (N,) -> (N, ns*256) f32; column s*256+px is sample
    s of pixel px.
    """
    px, py = _pixel_iota()
    x0 = seg[:, 0][:, None]
    y0 = seg[:, 1][:, None]
    x1 = seg[:, 2][:, None]
    y1 = seg[:, 3][:, None]
    dx = x1 - x0
    dy = y1 - y0
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    inv_dy = 1.0 / jnp.where(dy == 0.0, 1.0, dy)
    sgn = jnp.where(dy > 0.0, -1.0, 1.0)
    sgn_dx = jnp.sign(dx)
    ye = y_edge[:, None]
    outs = []
    for ox, oy in sample_offsets(ns):
        sx = px + ox
        sy = py + oy
        crossing = (sy >= ymin) & (sy < ymax)
        t = (sy - y0) * inv_dy
        xt = x0 + t * dx
        d = jnp.where(crossing & (xt < sx), sgn, 0.0)
        d = d + jnp.where(sy >= ye, sgn_dx, 0.0)
        outs.append(d)
    return jnp.concatenate(outs, axis=1)


def msaa_coverage_xla(seg_s, yedge_s, starts, backdrop, rule, ns: int):
    """Reference (XLA) sample-mask MSAA coverage: per-sample winding sums
    per fragment, fill rule per sample, box resolve. Materializes
    (T, ns*256) — fine for CPU/tests; the TPU path uses the fused Pallas
    kernel instead."""
    from .segmented import segment_sum_from_starts
    deltas = coverage_delta_msaa(seg_s, yedge_s, ns)
    sums = segment_sum_from_starts(deltas, starts)       # (F, ns*256)
    f = sums.shape[0]
    w = sums.reshape(f, ns, NPX) + backdrop[:, None, None]
    cov = apply_fill_rule(w.reshape(f * ns, NPX),
                          jnp.repeat(rule, ns, axis=0)).reshape(f, ns, NPX)
    return cov.mean(axis=1)


def apply_fill_rule(winding, rule):
    """winding (N, NPX); rule (N, 1) i32 (0 nonzero, 1 evenodd)."""
    nz = jnp.minimum(jnp.abs(winding), 1.0)
    eo = jnp.abs(winding - 2.0 * jnp.round(0.5 * winding))
    return jnp.where(rule == 1, eo, nz)


def eval_paints(tile_px, tile_py, paint_kind, color, grad_rec, paint_inv,
                image_rec, blur_rec, ramps, atlas, kinds_present):
    """Evaluate per-fragment paints, channel-planar.

    tile_px/tile_py: (N,) f32 tile origin in pixels. kinds_present: static
    frozenset — absent paint kinds are skipped at trace time.
    Returns (N, 4, NPX) premultiplied RGBA.
    """
    n = tile_px.shape[0]
    out = jnp.broadcast_to(color[:, :, None], (n, 4, NPX))
    needs_xy = (PAINT_GRADIENT in kinds_present
                or PAINT_IMAGE in kinds_present
                or PAINT_BLUR_RECT in kinds_present)
    if not needs_xy:
        return out
    px, py = _pixel_iota()
    gx = tile_px[:, None] + px + 0.5
    gy = tile_py[:, None] + py + 0.5
    inv = paint_inv
    lx = gx * inv[:, 0, None] + gy * inv[:, 2, None] + inv[:, 4, None]
    ly = gx * inv[:, 1, None] + gy * inv[:, 3, None] + inv[:, 5, None]

    if PAINT_GRADIENT in kinds_present:
        g = grad_rec

        def f(k):
            return g[:, k][:, None]

        kindg = f(0)
        t_lin = linear_t(jnp, lx, ly, f(2), f(3), f(4), f(5))
        t_rad, valid_rad = radial_t(jnp, lx, ly, f(2), f(3), f(4), f(5),
                                    f(6), f(7))
        t_swp = sweep_t(jnp, lx, ly, f(2), f(3), f(8), f(9))
        t = jnp.where(kindg == 0, t_lin,
                      jnp.where(kindg == 1, t_rad, t_swp))
        valid = jnp.where(kindg == 1, valid_rad, True)
        t = apply_extend_dynamic(jnp, t, f(1).astype(jnp.int32))
        rw = ramps.shape[1]
        flat = ramps.reshape(-1, 4)
        xg = jnp.clip(t, 0.0, 1.0) * (rw - 1)
        i0 = jnp.clip(jnp.floor(xg).astype(jnp.int32), 0, rw - 2)
        frac = xg - i0.astype(jnp.float32)          # (N, NPX)
        rowix = g[:, 10].astype(jnp.int32)[:, None]
        base_ix = rowix * rw + i0
        c0 = flat[base_ix]                           # (N, NPX, 4)
        c1 = flat[base_ix + 1]
        cg = c0 * (1.0 - frac[..., None]) + c1 * frac[..., None]
        ag = cg[..., 3]
        grad_p = jnp.concatenate(
            [(cg[..., :3] * ag[..., None]).transpose(0, 2, 1),
             ag[:, None, :]], axis=1)                # (N, 4, NPX)
        grad_p = jnp.where(valid[:, None, :], grad_p, 0.0)
        out = jnp.where((paint_kind == PAINT_GRADIENT)[:, None, None],
                        grad_p, out)

    if PAINT_IMAGE in kinds_present:
        # kinds_present also carries 10+quality markers for the image
        # sampling modes present in the scene (LOW=nearest, MEDIUM=bilinear,
        # HIGH=bicubic — fine.wgsl:897-925); absent modes cost nothing.
        from .paint import cubic_weights
        r = image_rec
        ax, ay = r[:, 0][:, None], r[:, 1][:, None]
        iw, ih = r[:, 2][:, None], r[:, 3][:, None]
        xe = r[:, 4].astype(jnp.int32)[:, None]
        ye_m = r[:, 5].astype(jnp.int32)[:, None]
        qual = r[:, 6].astype(jnp.int32)[:, None, None]
        alpha = r[:, 7][:, None, None]
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
        xmax = (ax + iw - 1).astype(jnp.int32)
        ymax = (ay + ih - 1).astype(jnp.int32)
        xmin = ax.astype(jnp.int32)
        ymin = ay.astype(jnp.int32)

        def tex(xi, yi):
            xi = jnp.clip(xi, xmin, xmax)
            yi = jnp.clip(yi, ymin, ymax)
            return aflat[yi * aw + xi]

        x0i = (ax + xf).astype(jnp.int32)
        y0i = (ay + yf).astype(jnp.int32)
        img_rgba = None
        if 11 in kinds_present or not (
                10 in kinds_present or 12 in kinds_present):
            c00 = tex(x0i, y0i)
            c01 = tex(x0i + 1, y0i)
            c10 = tex(x0i, y0i + 1)
            c11 = tex(x0i + 1, y0i + 1)
            img_rgba = ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
                        + (c10 * (1 - fx) + c11 * fx) * fy)
        if 10 in kinds_present:
            near = tex((ax + jnp.floor(ux + 0.5)).astype(jnp.int32),
                       (ay + jnp.floor(uy + 0.5)).astype(jnp.int32))
            img_rgba = near if img_rgba is None else \
                jnp.where(qual == 0, near, img_rgba)
        if 12 in kinds_present:
            wx = cubic_weights(jnp, fx[..., 0])
            wy = cubic_weights(jnp, fy[..., 0])
            acc = 0.0
            for j in range(4):
                row = 0.0
                for i in range(4):
                    row = row + tex(x0i + (i - 1), y0i + (j - 1)) \
                        * wx[i][..., None]
                acc = acc + row * wy[j][..., None]
            cub = jnp.clip(acc, 0.0, 1.0)
            img_rgba = cub if img_rgba is None else \
                jnp.where(qual == 2, cub, img_rgba)
        img_p = (img_rgba * alpha).transpose(0, 2, 1)    # (N, 4, NPX)
        out = jnp.where((paint_kind == PAINT_IMAGE)[:, None, None],
                        img_p, out)

    if PAINT_BLUR_RECT in kinds_present:
        br = blur_rec

        def fb(k):
            return br[:, k][:, None]

        cov = blur_ops.blurred_rounded_rect_coverage(
            jnp, lx, ly, fb(0), fb(1), fb(2), fb(3), fb(4), fb(5))
        cov = jnp.where(fb(6) != 0.0, 1.0 - cov, cov)   # inset shadows
        blur_p = color[:, :, None] * cov[:, None, :]
        out = jnp.where((paint_kind == PAINT_BLUR_RECT)[:, None, None],
                        blur_p, out)
    return out


def _transmittance(log_sum):
    """exp with a hard zero below the opacity threshold: a fragment with
    alpha >= 1-1e-7 must FULLY occlude (a 1e-9 leak flips discontinuous
    blend modes like color-dodge at cb==0)."""
    return jnp.where(log_sum <= -16.0, 0.0, jnp.exp(log_sum))


def _composite_core(src, alpha, gtile, n_gtiles):
    """Ordered src-over composite per tile via a SEGMENTED associative
    scan of the over maps L(d) = src + (1-a)*d: compose((m,s) earlier,
    (m',s') later) = (m*m', s' + m'*s). All intermediates stay in [0,1],
    unlike the previous log/exp transmittance formulation whose GLOBAL
    f32 cumsum of log1p(-a) cancels catastrophically once the running
    magnitude crosses ~1e4 (a ~100k-tile frame lost ~1e-2 per channel).
    Returns (tiles (G,4,NPX), t_tot (G,NPX))."""
    from .segmented import segment_starts
    m0 = 1.0 - jnp.minimum(alpha, 1.0)                  # (N, NPX)
    f0 = jnp.concatenate([jnp.ones((1,), bool),
                          gtile[1:] != gtile[:-1]])

    def combine(a, b):
        fa, ma, sa = a
        fb, mb, sb = b
        keep = fb[:, None]                              # b starts a segment
        m = jnp.where(keep, mb, ma * mb)
        s = jnp.where(keep[:, None], sb, sb + sa * mb[:, None, :])
        return fa | fb, m, s

    _, m, sscan = jax.lax.associative_scan(combine, (f0, m0, src))
    starts = segment_starts(gtile, n_gtiles)
    lo, hi = starts[:-1], starts[1:]
    has = hi > lo
    end = jnp.maximum(hi - 1, 0)
    tiles = jnp.where(has[:, None, None], sscan[end], 0.0)
    t_tot = jnp.where(has[:, None], m[end], 1.0)
    return tiles, t_tot


def composite_srcover(src, alpha, gtile, n_gtiles, base_color):
    """Transmittance-formulation ordered src-over composite.

    src: (N, 4, NPX) premultiplied, SORTED by (gtile, order). alpha:
    (N, NPX). gtile: (N,) sorted (invalid = n_gtiles). base_color: (4,)
    premultiplied. Returns (n_gtiles, 4, NPX).
    """
    tiles, t_tot = _composite_core(src, alpha, gtile, n_gtiles)
    return tiles + base_color[None, :, None] * t_tot[:, None, :]


def composite_srcover_over(src, alpha, gtile, bg_tiles):
    """Same, over an existing (n_gtiles, 4, NPX) backdrop buffer — the
    layered compositor's 'draws' op."""
    tiles, t_tot = _composite_core(src, alpha, gtile, bg_tiles.shape[0])
    return tiles + bg_tiles * t_tot[:, None, :]
