"""Device-side flattening: curves -> LineSoup, with viewport clipping.

The reference's ``flatten.wgsl`` (923 LoC) assigns one GPU thread per segment
and runs data-dependent Euler-spiral subdivision with bump allocation. The
TPU formulation is branch-free: degree-elevate everything to cubics, take
Wang's subdivision bound (clipped to MAX_LINES_PER_SEG), exclusive-cumsum the
counts, expand with one searchsorted, evaluate the cubics at uniform t, and
write the compact LineSoup with a single scatter. Wang's bound guarantees the
same flattening tolerance contract (0.25 px, matching sparse-strips
``vello_common/src/flatten.rs:16-19``); uniform-t needs ~1.5-2x more lines
than Euler spirals but every FLOP is dense VPU work.

Viewport clipping strategy (replaces the reference's bbox-clip DDA logic in
``path_count.wgsl:94-160``): y is *trimmed* parametrically (no winding effect
on remaining rows); x is *clamped* into [eps, W-eps], which deforms off-screen
geometry into verticals running just inside the boundary — winding-exact for
the visible region. A line crossing the left boundary needs its outside
portion preserved as a left-edge vertical (it carries winding); crossing the
right boundary the vertical carries winding only off-screen and is dropped.
These edge verticals go to a small side buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encoding.config import FLATTEN_TOL, MAX_LINES_PER_SEG

# Keep clamped verticals strictly inside the viewport. The strip [0, eps)
# of column 0 loses winding coverage for every path clipped at x=0, so eps
# must be far below the u8 quantum (1/255); 2^-10 is exactly representable
# next to widths up to 8192 (f32 ulp at 8192 is 2^-10). Was 1/64, which
# showed up as a visible 1.6%-per-clipped-path corner deficit in the
# basic.rs left-cull suite.
_EDGE_EPS = 2.0 ** -10


def elevate_to_cubic(points, kind):
    p0 = points[:, 0]
    line_p1 = points[:, 1]
    quad_c, quad_p2 = points[:, 1], points[:, 2]
    k = kind[:, None]
    c1 = jnp.where(k == 1, p0 + (line_p1 - p0) / 3.0,
                   jnp.where(k == 2, p0 + 2.0 / 3.0 * (quad_c - p0),
                             points[:, 1]))
    c2 = jnp.where(k == 1, p0 + 2.0 / 3.0 * (line_p1 - p0),
                   jnp.where(k == 2, quad_p2 + 2.0 / 3.0 * (quad_c - quad_p2),
                             points[:, 2]))
    p3 = jnp.where(k == 1, line_p1, jnp.where(k == 2, quad_p2, points[:, 3]))
    return jnp.stack([p0, c1, c2, p3], axis=1)


def wang_counts(cubics, kind, tol=FLATTEN_TOL, max_lines=MAX_LINES_PER_SEG):
    d1 = cubics[:, 0] - 2 * cubics[:, 1] + cubics[:, 2]
    d2 = cubics[:, 1] - 2 * cubics[:, 2] + cubics[:, 3]
    m = 6.0 * jnp.maximum(jnp.hypot(d1[..., 0], d1[..., 1]),
                          jnp.hypot(d2[..., 0], d2[..., 1]))
    n = jnp.ceil(jnp.sqrt(jnp.maximum(m, 0.0) / (8.0 * tol)))
    n = jnp.clip(n, 1, max_lines).astype(jnp.int32)
    n = jnp.where(kind == 1, 1, n)
    return jnp.where(kind == 0, 0, n)


def expand_by_counts(counts, out_size):
    """counts (S,) -> (idx (out_size,), sub (out_size,), valid (out_size,)).

    Slot j belongs to source element idx[j] with within-element index sub[j].
    The inverse of a bump allocator. Implemented as a sort-based merge
    (concatenate cumsum boundary markers with output positions, sort, count
    markers, sort back) — ~12x faster on TPU than the naive searchsorted,
    whose binary search serializes into ~20 dependent gathers.
    """
    s = len(counts)
    incl = jnp.cumsum(counts)
    total = incl[-1] if s else 0
    pos = jnp.arange(out_size, dtype=jnp.int32)
    # Sort cost on TPU scales with operand count (each merge pass moves every
    # channel), so pack (key, tag) into ONE i32 — the position payload is
    # recoverable from the key itself (packed >> 1) for tag-1 entries.
    packed = jnp.concatenate([incl.astype(jnp.int32) * 2,
                              pos * 2 + 1])
    (k_s,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    t_s = k_s & 1                     # 1 = output position entry
    seg = jnp.cumsum(1 - t_s)         # markers passed = source element index
    # restore output order: position entries (tag 1) sorted by position
    key2 = jnp.where(t_s == 1, k_s >> 1, jnp.int32(2 ** 30))
    _, seg_out = jax.lax.sort((key2, seg), num_keys=1, is_stable=False)
    idx = jnp.clip(seg_out[:out_size], 0, max(s - 1, 0)).astype(jnp.int32)
    # Within-element index WITHOUT a gather (offs[idx] costs ~10ns/row on
    # TPU): output positions of element k are exactly [offs[k], incl[k]), so
    # sub = pos - (first output position of this idx run), one cummax.
    is_new = jnp.concatenate([jnp.ones((1,), bool), idx[1:] != idx[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_new, pos, -1))
    sub = pos - run_start
    valid = pos < total
    return idx, sub, valid, total


def _sel7(e, v0, v1, v2, v3, v4, v5, v6):
    """7-way select on integer-valued float e in [0, 6]."""
    lo = jnp.where(e < 0.5, v0, jnp.where(e < 1.5, v1,
                   jnp.where(e < 2.5, v2, v3)))
    hi = jnp.where(e < 4.5, v4, jnp.where(e < 5.5, v5, v6))
    return jnp.where(e < 3.5, lo, hi)


def stroke_slot_line(p0x, p0y, p1x, p1y, p2x, p2y, hw, jnx, jny, join,
                     i, e, m):
    """Device stroke expansion: line endpoints for output slot (mini i,
    edge e) of a stroked segment (the in-frame analog of the reference's
    flatten.wgsl:328-630 stroke path, reformulated as a UNION of
    positively-oriented pieces so NonZero winding composes robustly).

    Mini-line i runs P0 -> P1 (uniform-t chords of the centerline cubic);
    each mini emits 7 lines: its offset quad (edges e0-e3: left, end,
    right-reversed, start) and the bevel triangle at the P1 vertex
    (e4-e6) filling the outer notch against the NEXT mini's quad. The
    next direction comes from P2 (chord of mini i+1) inside the segment,
    or from the precomputed join normal (jnx, jny) — the next SEGMENT's
    first-chord normal — at the segment boundary when ``join`` is set.
    All pieces share one orientation sign (quads by construction; the
    triangle corner order flips with the turn side), so overlaps only
    deepen winding and the union is exact. Butt caps are free: quad end
    edges close the swept region.

    Degenerate slots (zero-length minis, no-join segment ends, straight
    continuations) collapse to zero-length lines culled downstream.
    Shape-polymorphic: works on (1, B) kernel rows and (L,) XLA arrays.
    """
    dx = p1x - p0x
    dy = p1y - p0y
    l2 = dx * dx + dy * dy
    k = hw * jax.lax.rsqrt(jnp.maximum(l2, 1e-24))
    nx = dy * k
    ny = -dx * k
    d2x = p2x - p1x
    d2y = p2y - p1y
    l2b = d2x * d2x + d2y * d2y
    kb = hw * jax.lax.rsqrt(jnp.maximum(l2b, 1e-24))
    inner = i < m - 0.5
    n2x = jnp.where(inner, d2y * kb, jnx)
    n2y = jnp.where(inner, -d2x * kb, jny)
    has_tri = (inner | (join > 0.5)) & (l2 > 1e-24)
    # gap side of the vertex: sign(cross(d, d_next)) == sign(dot(d, n2))
    s = jnp.where(dx * n2x + dy * n2y >= 0.0, 1.0, -1.0)
    c1x = p1x + s * nx
    c1y = p1y + s * ny
    c2x = p1x + s * n2x
    c2y = p1y + s * n2y
    # corner order flips with the turn side to keep triangle winding
    # matching the quads'
    t1x = jnp.where(s > 0.0, c1x, c2x)
    t1y = jnp.where(s > 0.0, c1y, c2y)
    t2x = jnp.where(s > 0.0, c2x, c1x)
    t2y = jnp.where(s > 0.0, c2y, c1y)
    t1x = jnp.where(has_tri, t1x, p1x)
    t1y = jnp.where(has_tri, t1y, p1y)
    t2x = jnp.where(has_tri, t2x, p1x)
    t2y = jnp.where(has_tri, t2y, p1y)
    ax = _sel7(e, p0x + nx, p1x + nx, p1x - nx, p0x - nx, p1x, t1x, t2x)
    ay = _sel7(e, p0y + ny, p1y + ny, p1y - ny, p0y - ny, p1y, t1y, t2y)
    bx = _sel7(e, p1x + nx, p1x - nx, p0x - nx, p0x + nx, t1x, t2x, p1x)
    by = _sel7(e, p1y + ny, p1y - ny, p0y - ny, p0y + ny, t1y, t2y, p1y)
    # zero-length mini: collapse the whole slot group
    dead = l2 <= 1e-24
    ax = jnp.where(dead, p1x, ax)
    ay = jnp.where(dead, p1y, ay)
    bx = jnp.where(dead, p1x, bx)
    by = jnp.where(dead, p1y, by)
    return ax, ay, bx, by


STROKE_SLOTS = 7   # lines per stroke mini: 4 quad edges + 3 triangle edges


def stroke_mini_counts(cub, hw_dev, tol=FLATTEN_TOL,
                       max_lines=MAX_LINES_PER_SEG):
    """Subdivision count m per stroked segment: Wang's bound on the
    centerline (chord sagitta <= tol) combined with a turning-angle bound
    keeping the bevel-corner error of the offset polyline under tol
    (hw * theta^2 / 8 <= tol per vertex; total turning bounded by the
    control-polygon exterior angles)."""
    wang = wang_counts(cub, jnp.full(cub.shape[0], 3, jnp.int32), tol,
                       max_lines)
    v0 = cub[:, 1] - cub[:, 0]
    v1 = cub[:, 2] - cub[:, 1]
    v2 = cub[:, 3] - cub[:, 2]

    def ang(u, v):
        cr = jnp.abs(u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0])
        dt = u[:, 0] * v[:, 0] + u[:, 1] * v[:, 1]
        lu = jnp.hypot(u[:, 0], u[:, 1])
        lv = jnp.hypot(v[:, 0], v[:, 1])
        ok = (lu > 1e-12) & (lv > 1e-12)
        return jnp.where(ok, jnp.arctan2(cr, dt), 0.0)

    dtheta = ang(v0, v1) + ang(v1, v2)
    theta_max = jnp.sqrt(8.0 * tol / jnp.maximum(hw_dev, tol))
    m_turn = jnp.ceil(dtheta / theta_max)
    return jnp.clip(jnp.maximum(wang, m_turn), 1,
                    max_lines).astype(jnp.int32)


def flatten_fused(seg_pts, seg_kind, seg_path, n_segs,
                  n_lines_cap: int, width: float, height: float, rpack,
                  seg_hw=None, seg_join=None, interpret: bool = None,
                  max_lines: int = MAX_LINES_PER_SEG):
    """Fused Pallas flatten over host-compacted segment arrays.

    seg_pts arrives TRANSFORM-FOLDED (resolve applies the affine host-
    side; a per-segment (6,) f32 transform row was 30% of the scene
    upload) and seg_hw pre-scaled by sqrt(|det|). Wang counts run at
    segment scale in XLA; the kernel does the expansion, cubic eval,
    viewport trim/clamp, edge-vertical detection and DDA touch counts in
    VMEM (see pallas_kernels._flatten_kernel). Returns
    {"linepack" (16, L), "total_lines", "overflow"}."""
    from .pallas_kernels import (BLK_F, WIN_F, flatten_pallas,
                                 interpret_default)
    interpret = interpret_default() if interpret is None else interpret

    cub = elevate_to_cubic(seg_pts, seg_kind)
    counts = wang_counts(cub, seg_kind, max_lines=max_lines)
    s = cub.shape[0]
    has_stroke = seg_hw is not None
    if has_stroke:
        # Device stroke expansion: stroked segments emit 7 lines per
        # centerline mini (offset quad + bevel triangle); the join normal
        # is the NEXT segment's first-chord normal, computed here at
        # segment scale so the kernel's corner matches the next quad's.
        hw_dev = seg_hw
        is_stroke = hw_dev > 0.0
        m = stroke_mini_counts(cub, hw_dev, max_lines=max_lines)
        m = jnp.where(is_stroke, m, 0)
        counts = jnp.where(is_stroke, m * STROKE_SLOTS, counts)
        nxt = jnp.roll(cub, -1, axis=0)
        nxt_m = jnp.maximum(jnp.roll(m, -1), 1).astype(jnp.float32)
        tq = (1.0 / nxt_m)[:, None]
        mt = 1.0 - tq
        pn = (mt ** 3 * nxt[:, 0] + 3 * mt * mt * tq * nxt[:, 1]
              + 3 * mt * tq * tq * nxt[:, 2] + tq ** 3 * nxt[:, 3])
        ch = pn - nxt[:, 0]
        l2 = ch[:, 0] ** 2 + ch[:, 1] ** 2
        kj = hw_dev * jax.lax.rsqrt(jnp.maximum(l2, 1e-24))
        joinf = ((seg_join > 0) & is_stroke
                 & (l2 > 1e-24)).astype(jnp.float32)
        jnx = joinf * ch[:, 1] * kj
        jny = -joinf * ch[:, 0] * kj
        srows = [hw_dev[None], jnx[None], jny[None],
                 m.astype(jnp.float32)[None], joinf[None],
                 jnp.zeros((2, s), jnp.float32)]
    else:
        srows = [jnp.zeros((7, s), jnp.float32)]
    counts = jnp.where(jnp.arange(s, dtype=jnp.int32) < n_segs, counts, 0)
    incl = jnp.cumsum(counts)
    total = incl[-1]
    overflow = (total > n_lines_cap).astype(jnp.int32)
    offs = incl - counts
    pclip = jnp.clip(seg_path, 0, rpack.shape[0] - 1)
    rrow = rpack[pclip]                                   # (S, 6)
    spackT = jnp.concatenate([
        cub.reshape(s, 8).T,
        counts.astype(jnp.float32)[None],
        offs.astype(jnp.float32)[None],
        incl.astype(jnp.float32)[None],
        rrow.T] + srows, axis=0)                          # (24, S)
    spackT = jnp.pad(spackT, ((0, 0), (0, WIN_F)))
    g = n_lines_cap // BLK_F
    qpos = jnp.arange(g, dtype=jnp.int32) * BLK_F
    s0 = jnp.searchsorted(incl, qpos, side="right").astype(jnp.int32)
    s0s = jnp.concatenate([(s0 // 128) * 128,
                           total[None].astype(jnp.int32)])
    linepack = flatten_pallas(spackT, s0s, n_lines_cap, width, height,
                              has_stroke=has_stroke, interpret=interpret)
    return {"linepack": linepack, "total_lines": total,
            "overflow": overflow}


def flatten(decoded, n_lines_cap: int, n_edge_cap: int,
            width: float, height: float, rpack=None,
            has_stroke: bool = False,
            max_lines: int = MAX_LINES_PER_SEG):
    """decoded: output of pathtag.decode_and_transform.

    rpack: optional (P, 6) f32 per-path tile-rect fields; when given they are
    gathered at segment scale (S rows) and ride the line expansion, so the
    tiling stage needs no per-line gather (returned as line_rect/edge_rect).

    has_stroke (static): decoded carries "hw"/"join" with stroked segments
    present — enables device stroke expansion (7 slots per centerline
    mini, see stroke_slot_line).

    Returns dict with:
      lines (L, 4) f32   — y-trimmed, x-clamped line soup (x0,y0,x1,y1)
      line_path (L,) i32 — owning path index
      line_valid (L,) bool
      edge_* (E, ...)    — left-boundary vertical pieces (same fields)
      overflow           — i32 flags
    """
    cub = elevate_to_cubic(decoded["points"], decoded["kind"])
    counts = wang_counts(cub, decoded["kind"], max_lines=max_lines)
    s = cub.shape[0]
    if has_stroke:
        hw_dev = decoded["hw"]
        is_stroke = (hw_dev > 0.0) & (decoded["kind"] > 0)
        m = stroke_mini_counts(cub, hw_dev, max_lines=max_lines)
        m = jnp.where(is_stroke, m, 0)
        counts = jnp.where(is_stroke, m * STROKE_SLOTS, counts)
        # join normal = next segment's first-chord normal (within a
        # subpath, the continuation segment occupies the next tag slot)
        nxt = jnp.roll(cub, -1, axis=0)
        nxt_m = jnp.maximum(jnp.roll(m, -1), 1).astype(jnp.float32)
        tq = (1.0 / nxt_m)[:, None]
        mtq = 1.0 - tq
        pn = (mtq ** 3 * nxt[:, 0] + 3 * mtq * mtq * tq * nxt[:, 1]
              + 3 * mtq * tq * tq * nxt[:, 2] + tq ** 3 * nxt[:, 3])
        ch = pn - nxt[:, 0]
        l2j = ch[:, 0] ** 2 + ch[:, 1] ** 2
        kj = hw_dev * jax.lax.rsqrt(jnp.maximum(l2j, 1e-24))
        joinf = ((decoded["join"] > 0) & is_stroke
                 & (l2j > 1e-24)).astype(jnp.float32)
        stroke_cols = jnp.stack(
            [hw_dev, joinf * ch[:, 1] * kj, -joinf * ch[:, 0] * kj,
             m.astype(jnp.float32), joinf], axis=-1)     # (S, 5)
    incl = jnp.cumsum(counts)
    offs = (incl - counts).astype(jnp.float32)
    # One packed row-gather instead of several scalar gathers (a scalar
    # gather of n_lines_cap indices costs ~7 ms on TPU; a 12-wide row gather
    # costs about the same as one).
    parts = [
        cub.reshape(s, 8),
        counts.astype(jnp.float32)[:, None],
        offs[:, None],
        decoded["path_ix"].astype(jnp.float32)[:, None],
    ]
    if rpack is not None:
        pclip = jnp.clip(decoded["path_ix"], 0, rpack.shape[0] - 1)
        parts.append(rpack[pclip])              # (S, 6) — S-scale gather
    if has_stroke:
        parts.append(stroke_cols)
    pack = jnp.concatenate(parts, axis=-1)      # (S, 11[+6][+5])
    seg_ix, _, valid, total = expand_by_counts(counts, n_lines_cap)
    overflow_lines = (total > n_lines_cap).astype(jnp.int32)

    row = pack[seg_ix]                          # (L, 11+)
    c = row[:, :8].reshape(-1, 4, 2)
    n = jnp.maximum(row[:, 8], 1.0)
    sub_f = jnp.arange(n_lines_cap, dtype=jnp.float32) - row[:, 9]
    t0 = sub_f / n
    t1 = (sub_f + 1.0) / n
    row_path = row[:, 10].astype(jnp.int32)

    def ev(t):
        t = t[:, None]
        mt = 1.0 - t
        return (mt ** 3 * c[:, 0] + 3 * mt * mt * t * c[:, 1]
                + 3 * mt * t * t * c[:, 2] + t ** 3 * c[:, 3])

    if has_stroke:
        sbase = pack.shape[1] - 5
        mrow = row[:, sbase + 3]
        st = mrow > 0.5
        msafe = jnp.maximum(mrow, 1.0)
        si = jnp.floor((sub_f + 0.5) * (1.0 / STROKE_SLOTS))
        se = sub_f - STROKE_SLOTS * si
        t0 = jnp.where(st, si / msafe, t0)
        t1 = jnp.where(st, (si + 1.0) / msafe, t1)

    p0 = ev(t0)
    p1 = ev(t1)

    if has_stroke:
        p2 = ev((si + 2.0) / msafe)
        ax, ay, bx, by = stroke_slot_line(
            p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1],
            row[:, sbase], row[:, sbase + 1], row[:, sbase + 2],
            row[:, sbase + 4], si, se, msafe)
        p0 = jnp.stack([jnp.where(st, ax, p0[:, 0]),
                        jnp.where(st, ay, p0[:, 1])], axis=-1)
        p1 = jnp.stack([jnp.where(st, bx, p1[:, 0]),
                        jnp.where(st, by, p1[:, 1])], axis=-1)

    # --- y trim (parametric, exact) ---
    y0, y1 = p0[:, 1], p1[:, 1]
    dy = y1 - y0
    y0c = jnp.clip(y0, 0.0, height)
    y1c = jnp.clip(y1, 0.0, height)
    nzy = jnp.abs(dy) > 1e-12
    inv_dy = jnp.where(nzy, 1.0 / jnp.where(nzy, dy, 1.0), 0.0)
    # Horizontal lines (dy==0): keep endpoints (ta=0, tb=1); they were either
    # fully inside the y range or are collapsed by the clip equality check.
    ta = jnp.where(nzy, (y0c - y0) * inv_dy, 0.0)
    tb = jnp.where(nzy, (y1c - y0) * inv_dy, 1.0)
    # Only REPLACE endpoints that were actually trimmed: recomputing an
    # untrimmed endpoint parametrically costs ~1 ulp (tb = 0.99999994...)
    # and endpoint exactness matters — the top-edge crossing rule compares
    # floor(y/T) == y/T on trimmed-to-boundary endpoints.
    x0 = jnp.where(y0c != y0, p0[:, 0] + ta * (p1[:, 0] - p0[:, 0]),
                   p0[:, 0])
    x1 = jnp.where(y1c != y1, p0[:, 0] + tb * (p1[:, 0] - p0[:, 0]),
                   p1[:, 0])
    y0, y1 = y0c, y1c
    # degenerate after trim -> collapses (zero tiles later)
    alive = valid & (jnp.abs(y1 - y0) + jnp.abs(x1 - x0) > 1e-12)

    # --- x clamp; emit left-edge verticals for the clipped-off winding ---
    lo = _EDGE_EPS
    hi = jnp.maximum(width - _EDGE_EPS, lo + 1e-3)
    x0c = jnp.clip(x0, lo, hi)
    x1c = jnp.clip(x1, lo, hi)
    dx = x1 - x0
    nzx = jnp.abs(dx) > 1e-12
    inv_dx = jnp.where(nzx, 1.0 / jnp.where(nzx, dx, 1.0), 0.0)
    # y at the points where x enters/leaves the clamp range (u clipped so
    # entirely-outside lines don't extrapolate).
    u0 = jnp.where(nzx, jnp.clip((x0c - x0) * inv_dx, 0.0, 1.0), 0.0)
    u1 = jnp.where(nzx, jnp.clip((x1c - x0) * inv_dx, 0.0, 1.0), 1.0)
    ye0 = y0 + u0 * (y1 - y0)   # y where the clamped middle piece starts
    ye1 = y0 + u1 * (y1 - y0)   # ... ends
    # A line entirely left of the viewport becomes a full vertical at lo
    # (carries all its winding); entirely right becomes a vertical at hi
    # (winding only off-screen).
    left_all = jnp.maximum(x0, x1) <= lo
    right_all = jnp.minimum(x0, x1) >= hi
    outside = left_all | right_all
    # Same exactness rule: keep unclamped endpoints bit-identical.
    my0 = jnp.where(outside | (x0c == x0), y0, ye0)
    my1 = jnp.where(outside | (x1c == x1), y1, ye1)
    mid = jnp.stack([x0c, my0, x1c, my1], axis=-1)
    mid = jnp.where(alive[:, None], mid, 0.0)

    # Left-edge vertical for lines CROSSING x=lo: the outside portion maps to
    # a vertical at lo — at the start if moving right, at the end if left.
    crossing = alive & nzx & (jnp.minimum(x0, x1) < lo) \
        & (jnp.maximum(x0, x1) > lo)
    need_start = crossing & (x0 < x1)
    needs_edge = crossing
    ev_y0 = jnp.where(need_start, y0, ye1)
    ev_y1 = jnp.where(need_start, ye0, y1)
    edge_counts = needs_edge.astype(jnp.int32)
    eparts = [jnp.stack([ev_y0, ev_y1,
                         row_path.astype(jnp.float32)], axis=-1)]
    if rpack is not None:
        eparts.append(row[:, 11:17])
    epack = jnp.concatenate(eparts, axis=-1)
    eix, _, evalid, etotal = expand_by_counts(edge_counts, n_edge_cap)
    overflow_edges = (etotal > n_edge_cap).astype(jnp.int32)
    erow = epack[eix]
    edge_lines = jnp.stack([
        jnp.full_like(erow[:, 0], lo), erow[:, 0],
        jnp.full_like(erow[:, 0], lo), erow[:, 1]], axis=-1)
    edge_lines = jnp.where(evalid[:, None], edge_lines, 0.0)

    out = {
        "lines": mid.astype(jnp.float32),
        "line_path": jnp.where(alive, row_path, 2 ** 30).astype(jnp.int32),
        "line_valid": alive,
        "line_real": valid,    # real (non-padding) slot, even if degenerate
        "edge_lines": edge_lines.astype(jnp.float32),
        "edge_path": jnp.where(evalid, erow[:, 2].astype(jnp.int32),
                               2 ** 30).astype(jnp.int32),
        "edge_valid": evalid,
        "overflow": overflow_lines + 2 * overflow_edges,
    }
    if rpack is not None:
        out["line_rect"] = row[:, 11:17]
        out["edge_rect"] = erow[:, 3:9]
    return out
