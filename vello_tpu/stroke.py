"""Host-side stroke expansion: convert stroked paths into fill outlines.

Architecture note: the reference's classic pipeline expands strokes on-GPU via
Euler spirals (``vello_shaders/shader/flatten.wgsl:328-630``, the "GPU-friendly
Stroke Expansion" paper), while its sparse-strips family strokes on the CPU via
kurbo (``sparse_strips/vello_common/src/flatten.rs``). We take the CPU route —
polyline offsetting with join/cap/dash support — because stroke expansion is
O(path length) host work while the device does O(pixels) raster work; this is
the TPU-friendly split. Output polygons are filled NonZero.

Dashing covers ``kurbo::dash`` as used at ``vello/src/scene.rs:428-439``.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np

from .kurbo import Affine, BezPath, Stroke, flatten_path


def _dedup(poly: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Remove consecutive duplicate points."""
    if len(poly) < 2:
        return poly
    d = np.linalg.norm(np.diff(poly, axis=0), axis=1)
    keep = np.concatenate([[True], d > eps])
    return poly[keep]


def _arc_points(center, r, a0, a1, tol) -> np.ndarray:
    """Points along an arc from angle a0 to a1 (radians), excluding endpoints'
    exact duplicates handled by caller. Direction follows sign of (a1-a0)."""
    sweep = a1 - a0
    if abs(sweep) < 1e-12 or r <= 1e-12:
        return np.zeros((0, 2))
    dtheta = 2.0 * math.acos(max(-1.0, min(1.0, 1.0 - tol / r)))
    n = max(1, int(math.ceil(abs(sweep) / max(dtheta, 1e-3))))
    ts = np.linspace(a0, a1, n + 1)[1:-1]
    return np.stack([center[0] + r * np.cos(ts),
                     center[1] + r * np.sin(ts)], axis=-1)


def dash_polyline(poly: np.ndarray, pattern: Sequence[float],
                  offset: float, closed: bool) -> List[np.ndarray]:
    """Split a polyline into 'on' pieces per the dash pattern."""
    pattern = [p for p in pattern]
    if not pattern or all(p <= 0 for p in pattern):
        return [poly]
    if len(pattern) % 2 == 1:
        pattern = pattern + pattern  # odd patterns repeat doubled (SVG rule)
    total = sum(pattern)
    if closed and not np.allclose(poly[0], poly[-1]):
        poly = np.concatenate([poly, poly[:1]], axis=0)
    segs = np.diff(poly, axis=0)
    seglen = np.linalg.norm(segs, axis=1)
    pieces: List[List[np.ndarray]] = []
    # State: position within the dash cycle.
    pos = offset % total
    # Find current pattern index.
    pi = 0
    while pos >= pattern[pi]:
        pos -= pattern[pi]
        pi = (pi + 1) % len(pattern)
    on = pi % 2 == 0
    cur: List[np.ndarray] = [poly[0]] if on else []
    for i in range(len(segs)):
        remaining = seglen[i]
        t0 = 0.0
        if remaining <= 1e-12:
            continue
        while remaining > 1e-12:
            room = pattern[pi] - pos
            if room > remaining:
                pos += remaining
                t1 = 1.0
                if on:
                    cur.append(poly[i] + segs[i] * t1)
                remaining = 0.0
            else:
                t1 = t0 + room / seglen[i]
                pt = poly[i] + segs[i] * t1
                if on:
                    cur.append(pt)
                    pieces.append(cur)
                    cur = []
                else:
                    cur = [pt]
                remaining -= room
                t0 = t1
                pos = 0.0
                pi = (pi + 1) % len(pattern)
                on = pi % 2 == 0
    if on and len(cur) >= 2:
        pieces.append(cur)
    return [np.asarray(p) for p in pieces if len(p) >= 2]


def _offset_side(poly: np.ndarray, hw: float, join: str, miter_limit: float,
                 tol: float) -> List[np.ndarray]:
    """Offset an open polyline to its left side by hw, with joins.

    Returns the list of points tracing the offset curve in forward order.
    """
    pts: List[np.ndarray] = []
    d = np.diff(poly, axis=0)
    ln = np.linalg.norm(d, axis=1)
    ln = np.where(ln < 1e-12, 1.0, ln)
    tangents = d / ln[:, None]
    # Left normal for y-down coords: rotate tangent by -90deg -> (ty, -tx)
    normals = np.stack([tangents[:, 1], -tangents[:, 0]], axis=-1)
    n_seg = len(d)
    pts.append(poly[0] + hw * normals[0])
    for i in range(n_seg):
        pts.append(poly[i + 1] + hw * normals[i])
        if i + 1 < n_seg:
            n0, n1 = normals[i], normals[i + 1]
            cross = tangents[i, 0] * tangents[i + 1, 1] \
                - tangents[i, 1] * tangents[i + 1, 0]
            # Turning right (cross > 0 in y-down) means this (left) side is
            # the outside of the turn and needs join geometry.
            if cross < -1e-12:
                # Inner side of the turn: route through the vertex itself.
                # Naive inner offsets self-intersect when a neighbor segment
                # is shorter than the half-width, and the flipped loop's
                # winding punches a hole in the NonZero fill; inserting the
                # centerline vertex keeps the outline winding positive
                # (kurbo stroke.rs inner-join handling).
                pts.append(poly[i + 1])
            if cross > 1e-12:
                v = poly[i + 1]
                if join == "round":
                    a0 = math.atan2(n0[1], n0[0])
                    a1 = math.atan2(n1[1], n1[0])
                    # take the short way matching turn direction
                    while a1 - a0 > math.pi:
                        a1 -= 2 * math.pi
                    while a1 - a0 < -math.pi:
                        a1 += 2 * math.pi
                    arc = _arc_points(v, hw, a0, a1, tol)
                    pts.extend(arc)
                elif join == "miter":
                    # Intersect the two offset lines.
                    nm = n0 + n1
                    nm_len2 = nm @ nm
                    if nm_len2 > 1e-12:
                        # miter point = v + hw * nm * (2 / |n0+n1|^2)
                        m = v + hw * nm * (2.0 / nm_len2)
                        miter_len = np.linalg.norm(m - v)
                        if miter_len <= miter_limit * hw:
                            pts.append(m)
                # bevel: nothing extra — the two offset points connect.
            pts.append(poly[i + 1] + hw * (normals[i + 1] if i + 1 < n_seg
                                           else normals[i]))
    return pts


def _cap_points(p: np.ndarray, n: np.ndarray, hw: float, cap: str,
                tol: float) -> List[np.ndarray]:
    """Cap geometry from point p+hw*n around to p-hw*n (n = left normal,
    forward direction t = rotate(n, +90) in y-down: t = (-n.y, n.x))."""
    if cap == "butt":
        return []
    t = np.array([-n[1], n[0]])
    if cap == "square":
        return [p + hw * n + hw * t, p - hw * n + hw * t]
    # round
    a0 = math.atan2(n[1], n[0])
    a1_candidates = [a0 + math.pi, a0 - math.pi]
    # go through the tangent direction: midpoint angle should be atan2(t)
    amid = math.atan2(t[1], t[0])
    a1 = min(a1_candidates, key=lambda a: abs(((a0 + a) / 2 - amid + math.pi)
                                              % (2 * math.pi) - math.pi))
    return list(_arc_points(p, hw, a0, a1, tol))


def stroke_polyline(poly: np.ndarray, style: Stroke, closed: bool,
                    tol: float) -> List[np.ndarray]:
    """Expand one polyline into closed outline polygon(s)."""
    poly = _dedup(np.asarray(poly, dtype=np.float64))
    hw = style.width / 2.0
    if len(poly) < 2 or hw <= 0:
        if len(poly) == 1 and hw > 0 and style.start_cap == "round":
            # Degenerate dot with round caps -> circle.
            ang = np.linspace(0, 2 * math.pi, 32, endpoint=False)
            return [poly[0] + hw * np.stack([np.cos(ang), np.sin(ang)], -1)]
        return []
    if closed and not np.allclose(poly[0], poly[-1]):
        poly = np.concatenate([poly, poly[:1]], axis=0)
        poly = _dedup(poly)
    if closed and len(poly) >= 3:
        # Closed contour: outer ring (left offset forward) + inner ring
        # (left offset of reversed contour). NonZero fill of both = annulus.
        # Append wrap-around point so joins at the seam are handled.
        ext = np.concatenate([poly, poly[1:2]], axis=0)
        outer = _offset_side(ext, hw, style.join, style.miter_limit, tol)
        rev = poly[::-1]
        ext_r = np.concatenate([rev, rev[1:2]], axis=0)
        inner = _offset_side(ext_r, hw, style.join, style.miter_limit, tol)
        return [np.asarray(outer), np.asarray(inner)]
    # Open: left side forward + end cap + left side of reversed + start cap.
    fwd = _offset_side(poly, hw, style.join, style.miter_limit, tol)
    rev = poly[::-1]
    bwd = _offset_side(rev, hw, style.join, style.miter_limit, tol)
    d_end = poly[-1] - poly[-2]
    d_end /= max(np.linalg.norm(d_end), 1e-12)
    n_end = np.array([d_end[1], -d_end[0]])
    d_start = poly[0] - poly[1]
    d_start /= max(np.linalg.norm(d_start), 1e-12)
    n_start = np.array([d_start[1], -d_start[0]])
    out = list(fwd)
    out += _cap_points(poly[-1], n_end, hw, style.end_cap, tol)
    out += list(bwd)
    out += _cap_points(poly[0], n_start, hw, style.start_cap, tol)
    return [np.asarray(out)]


def expand_stroke(path: BezPath, style: Stroke,
                  transform: Affine = Affine.IDENTITY,
                  tol: float = 0.1) -> List[np.ndarray]:
    """Full stroke expansion: flatten -> dash -> offset. Returns closed
    polygons in *path-local* space (caller applies the transform), to be
    filled NonZero. Tolerance is in device space (divided by transform scale).
    """
    scale = max(transform.scale_factor(), 1e-12)
    tol_local = tol / scale
    if style.dash_pattern:
        # dash phases accumulate the polyline-vs-curve arc-length error;
        # flatten 4x finer when dashing so dash boundaries stay within
        # ~tol/4 of their true arc-length positions (kurbo::dash measures
        # on the exact curve, scene.rs:428-439)
        tol_local = tol_local / 4.0
    hw = style.width / 2.0
    # Offset-tolerance subdivision: flattening to centerline tolerance is
    # NOT enough for the offset curves — a tangent step of dθ displaces the
    # offset by ~hw·dθ²/8. Bound dθ by sqrt(8·tol/hw) using the control
    # polygon's turn angle (which bounds the curve's tangent turn).
    # (The role of the reference's offset-aware Euler-spiral subdivision,
    # flatten.wgsl:328-630 / the GPU stroke-expansion paper.)
    dtheta_max = math.sqrt(8.0 * tol_local / max(hw, tol_local, 1e-12))

    def _turn(pts_ctl) -> float:
        turn = 0.0
        for i in range(len(pts_ctl) - 2):
            ax, ay = (pts_ctl[i + 1][0] - pts_ctl[i][0],
                      pts_ctl[i + 1][1] - pts_ctl[i][1])
            bx, by = (pts_ctl[i + 2][0] - pts_ctl[i + 1][0],
                      pts_ctl[i + 2][1] - pts_ctl[i + 1][1])
            la = math.hypot(ax, ay)
            lb = math.hypot(bx, by)
            if la < 1e-12 or lb < 1e-12:
                continue
            c = max(-1.0, min(1.0, (ax * bx + ay * by) / (la * lb)))
            turn += math.acos(c)
        return turn

    outlines: List[np.ndarray] = []
    # Flatten WITHOUT closing open subpaths (stroke semantics differ from fill)
    for sub in path.subpaths():
        pts = []
        closed = False
        start = cur = None
        from .kurbo import MOVE_TO, LINE_TO, QUAD_TO, CURVE_TO, CLOSE
        from .kurbo import wang_quad_count, wang_cubic_count, eval_quad, \
            eval_cubic
        for verb, vp in sub:
            if verb == MOVE_TO:
                start = cur = vp[0]
                pts.append(cur)
            elif verb == LINE_TO:
                cur = vp[0]
                pts.append(cur)
            elif verb == QUAD_TO:
                n = wang_quad_count(cur, vp[0], vp[1], tol_local)
                n = max(n, int(math.ceil(
                    _turn([cur, vp[0], vp[1]]) / dtheta_max)))
                ts = np.arange(1, n + 1) / n
                pts.extend(map(tuple, eval_quad(cur, vp[0], vp[1], ts)))
                cur = vp[1]
            elif verb == CURVE_TO:
                n = wang_cubic_count(cur, vp[0], vp[1], vp[2], tol_local)
                n = max(n, int(math.ceil(
                    _turn([cur, vp[0], vp[1], vp[2]]) / dtheta_max)))
                ts = np.arange(1, n + 1) / n
                pts.extend(map(tuple,
                               eval_cubic(cur, vp[0], vp[1], vp[2], ts)))
                cur = vp[2]
            elif verb == CLOSE:
                closed = True
                if cur != start:
                    pts.append(start)
        if len(pts) < 1:
            continue
        poly = np.asarray(pts)
        if style.dash_pattern:
            pieces = dash_polyline(poly, style.dash_pattern,
                                   style.dash_offset, closed)
            for piece in pieces:
                outlines.extend(stroke_polyline(piece, style, False,
                                                tol_local))
        else:
            outlines.extend(stroke_polyline(poly, style, closed, tol_local))
    return outlines
