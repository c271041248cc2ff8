"""Late binding: resolve brushes to ramp LUTs / image atlas, build per-path
paint tables, and estimate capacity tiers.

Covers the roles of ``vello_encoding/src/resolve.rs`` (Resolver),
``ramp_cache.rs`` (gradient LUTs), ``image_cache.rs`` (atlas) and
``estimate.rs`` (BumpEstimator) in the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..kurbo import Affine
from ..peniko import (BlendMode, Color, Compose, Extend, Fill, Gradient,
                      Image, ImageQuality, Mix)
from .config import (Capacities, FLATTEN_TOL, MAX_LINES_PER_SEG, TILE_H,
                     TILE_W, RenderParams, tier_for)
from .encoding import (DRAW_BEGIN_LAYER, DRAW_BLUR_RECT, DRAW_COLOR,
                       DRAW_END_LAYER, DRAW_GRADIENT, DRAW_IMAGE, Encoding,
                       decode_segments)
from ..ops.paint import RAMP_WIDTH, make_ramp, pack_gradient

# paint kinds (per-path table)
PAINT_COLOR = 0
PAINT_GRADIENT = 1
PAINT_IMAGE = 2
PAINT_BLUR_RECT = 3


@dataclass
class LayerInfo:
    """Oracle-facing layer record (draw-stream order)."""
    draw_ix: int
    mix: int
    compose: int
    alpha: float
    clip_path_ix: int  # -1 if no clip shape
    fill_rule: int
    layer_filter: tuple = None  # (kind, sigma, dx, dy, r, g, b, a)


@dataclass
class ResolvedScene:
    """Everything the pipelines need, as numpy arrays."""

    # path streams
    tags: np.ndarray          # (T,) u8
    data: np.ndarray          # (Pt, 2) f32
    transforms: np.ndarray    # (N, 6) f32
    styles: np.ndarray        # (S,) i32
    n_paths: int
    n_segs: int
    # draw stream (per draw record)
    draw_kind: np.ndarray     # (D,) i32
    draw_path_ix: np.ndarray  # (D,) i32, -1 when no geometry
    layers: List[LayerInfo]
    # per-path tables (P entries)
    paint_kind: np.ndarray    # (P,) i32
    fill_rule: np.ndarray     # (P,) i32
    color: np.ndarray         # (P, 4) premultiplied f32
    grad_rec: np.ndarray      # (P, 12) f32
    paint_inv: np.ndarray     # (P, 6) f32 inverse paint transform
    image_rec: np.ndarray     # (P, 8) f32: atlas x,y,w,h, xext, yext, qual, alpha
    blur_rec: np.ndarray      # (P, 8) f32: x0,y0,x1,y1, radius, std_dev
    path_kind: np.ndarray     # (P,) i32: 0 draw, 1 clip-begin
    path_rect: np.ndarray     # (P, 4) i32 clamped tile-space bbox (host hull)
    # compacted per-segment arrays (host decode; lets the fused device
    # flatten skip the tag scan and keeps real segments contiguous so the
    # Pallas window bound holds — the tag streams above remain the
    # interchange format and drive the XLA fallback path)
    seg_pts: np.ndarray = None    # (S, 4, 2) f32 raw control points
    # (seg_pts carries the TRANSFORM-FOLDED control points — no per-
    # segment transform row is stored or uploaded; see resolve() tail)
    seg_path: np.ndarray = None   # (S,) i32 owning path
    seg_kind: np.ndarray = None   # (S,) i32 1=line 2=quad 3=cubic
    # device stroke expansion (0 everywhere = all fills)
    seg_hw: np.ndarray = None     # (S,) f32 raw stroke half-width
    seg_join: np.ndarray = None   # (S,) i32 1 = next segment continues
    styles_hw: np.ndarray = None  # (Ns,) f32 per-style half-widths
    has_stroke: bool = False
    # paths per draw record (batch fills/strokes cover N consecutive
    # paths with one record; 1 for plain geometric draws, 0 otherwise)
    draw_path_n: np.ndarray = None  # (D,) i32
    # per-segment flatten subdivision cap for this frame (>= the default
    # MAX_LINES_PER_SEG; raised when the estimator detects pathological
    # segments so the 0.25 px tolerance holds instead of coarsening)
    max_lines: int = MAX_LINES_PER_SEG
    # resources
    ramps: np.ndarray = None      # (R, 512, 4) straight f32
    atlas: np.ndarray = None      # (Ha, Wa, 4) premultiplied f32
    # estimator results
    est_lines: int = 0
    est_touches: int = 0
    est_path_tiles: int = 0
    est_live: int = 0
    est_edges: int = 0
    # conservative host flag: any geometry may cross the left viewport
    # boundary (x = EDGE_EPS)? When False the pipeline statically skips the
    # edge-vertical expansion (two L-scale device sorts); a device-side
    # guard flag triggers a retry with the edge path enabled if the
    # conservative hull test was ever wrong.
    has_left_edge: bool = True

    def capacities(self, params: RenderParams) -> Capacities:
        return tier_for(
            n_tags=len(self.tags), n_points=len(self.data),
            n_segs=self.n_segs, est_lines=self.est_lines,
            est_touches=self.est_touches,
            est_path_tiles=self.est_path_tiles, n_paths=self.n_paths,
            n_transforms=len(self.transforms), n_styles=len(self.styles),
            n_ramps=max(len(self.ramps), 1), est_edges=self.est_edges)


class RampCache:
    """Gradient-stop dedup cache -> LUT rows (ramp_cache.rs analog)."""

    def __init__(self):
        self._map: Dict[tuple, int] = {}
        self._ramps: List[np.ndarray] = []

    def add(self, stops, alpha_space: str = "unpremultiplied") -> int:
        key = (alpha_space,) + tuple(
            (s.offset, s.color.r, s.color.g, s.color.b, s.color.a)
            for s in stops)
        if key in self._map:
            return self._map[key]
        ix = len(self._ramps)
        self._ramps.append(make_ramp(stops, alpha_space=alpha_space))
        self._map[key] = ix
        return ix

    def array(self) -> np.ndarray:
        if not self._ramps:
            return np.zeros((1, RAMP_WIDTH, 4), dtype=np.float32)
        return np.stack(self._ramps)


class ImageAtlas:
    """Shelf-packed RGBA atlas with content-hash keys, generation-based
    eviction, and a growable bounded extent (reference ``image_cache.rs:
    9-11,113-182``: 1024 initial, growth to 8192 max, eviction after 2
    unused generations; ``multi_atlas.rs`` page model collapses to
    vertical shelf pages under one height cap here — TPU has no
    texture-size limit, only a memory budget).

    Width grows by doubling (1024 → ... → ``MAX_WIDTH``) when an image
    wider than the current page arrives or when the live set overflows
    after eviction. Width growth is **position-stable**: existing
    shelves keep their (x, y), so already-resolved image records stay
    valid — only eviction/repack relocates entries.

    ``array()`` is incremental: the packed page is cached; only entries
    added since the last call are premultiplied + blitted (copy-on-write
    so previously returned arrays are never mutated), and a no-change
    resolve returns the cached array untouched. Full re-blits happen
    only after eviction/repack (counted in ``rebuilds``).

    Multi-page (round 5, ``multi_atlas.rs`` role): past the GPU-shaped
    8192-row page, the atlas keeps stacking PAGE_H-row virtual pages
    vertically up to a MEMORY budget (VELLO_TPU_ATLAS_BUDGET_MB, default
    2048 — TPU sampling is a gather into one HBM array, so "pages" need
    no plumbing: entries keep absolute (x, y)). Overflow order: evict ->
    widen -> add pages -> only then fail.

    Keys are content hashes (an ``id()`` key can alias after GC); an
    id-keyed weakref memo makes repeat adds of a live array O(1)."""

    PAGE_H = 8192
    MAX_WIDTH = 8192

    @property
    def MAX_HEIGHT(self) -> int:
        """Budget-driven row cap (page-quantized); tests override it."""
        if self._max_height is not None:
            return self._max_height
        import os
        budget = int(os.environ.get("VELLO_TPU_ATLAS_BUDGET_MB", "2048"))
        rows = (budget << 20) // (self.width * 16)   # f32 RGBA = 16 B/px
        return max((rows // self.PAGE_H) * self.PAGE_H, self.PAGE_H)

    @MAX_HEIGHT.setter
    def MAX_HEIGHT(self, v: int) -> None:
        self._max_height = int(v)

    def __init__(self, width: int = 1024):
        self._max_height = None
        self.width = width
        self.shelves: List[List[int]] = []  # [y, height, cursor_x]
        self.height = 0
        self.generation = 0
        # content_key -> [x, y, w, h, last_used_generation, Image]
        self.entries: Dict[tuple, list] = {}
        self._id_memo: Dict[int, tuple] = {}
        self.evictions = 0
        self.rebuilds = 0            # full re-blit count
        self._packed = None          # cached padded (H, W, 4) f32 page
        self._dirty: List[tuple] = []  # keys blitted since last array()
        self._needs_rebuild = True

    def begin_generation(self) -> None:
        """Advance the frame generation (Resolver calls this per resolve);
        entries untouched for 2 generations become evictable."""
        self.generation += 1

    def _content_key(self, data: np.ndarray) -> tuple:
        import hashlib
        import weakref
        memo = self._id_memo.get(id(data))
        if memo is not None and memo[0]() is data:
            return memo[1]
        key = (data.shape[:2],
               hashlib.sha1(np.ascontiguousarray(data).tobytes()).digest())
        try:
            self._id_memo[id(data)] = (weakref.ref(data), key)
        except TypeError:
            pass
        return key

    def _alloc(self, w: int, h: int):
        for shelf in self.shelves:
            if shelf[1] >= h and shelf[2] + w <= self.width:
                x = shelf[2]
                shelf[2] += w
                return (x, shelf[0])
        if self.height + h <= self.MAX_HEIGHT:
            y = self.height
            self.shelves.append([y, h, w])
            self.height += h
            return (0, y)
        return None

    def _evict_and_repack(self) -> None:
        """Drop entries unused for >= 2 generations, repack survivors
        (tallest-first keeps shelves tight). Relocates entries, so the
        cached packed page needs a full re-blit."""
        live = [(k, e) for k, e in self.entries.items()
                if e[4] >= self.generation - 1]
        self.shelves = []
        self.height = 0
        self.entries = {}
        self._id_memo = {}
        self.evictions += 1
        self._needs_rebuild = True
        self._dirty = []
        from ..utils.log import get_logger
        get_logger().info("atlas eviction #%d: %d live images repacked",
                          self.evictions, len(live))
        for k, e in sorted(live, key=lambda kv: -kv[1][3]):
            img = e[5]
            h, w = img.data.shape[:2]
            pos = self._alloc(w, h)
            while pos is None and self.width < self.MAX_WIDTH:
                self.width = min(self.width * 2, self.MAX_WIDTH)
                pos = self._alloc(w, h)
            if pos is None:
                raise RuntimeError(
                    f"image atlas overflow: live images exceed "
                    f"{self.width}x{self.MAX_HEIGHT}")
            self.entries[k] = [pos[0], pos[1], w, h, e[4], img]

    def add(self, img: Image) -> Tuple[int, int, int, int]:
        key = self._content_key(img.data)
        e = self.entries.get(key)
        if e is not None:
            e[4] = self.generation
            return tuple(e[:4])
        h, w = img.data.shape[:2]
        if w > self.MAX_WIDTH or h > self.MAX_HEIGHT:
            raise ValueError(f"image {w}x{h} exceeds atlas budget extent "
                             f"{self.MAX_WIDTH}x{self.MAX_HEIGHT}")
        while w > self.width:
            # grow the page for a wide image: shelves keep their (x, y)
            self.width = min(self.width * 2, self.MAX_WIDTH)
        pos = self._alloc(w, h)
        if pos is None:
            self._evict_and_repack()
            pos = self._alloc(w, h)
        while pos is None and self.width < self.MAX_WIDTH:
            self.width = min(self.width * 2, self.MAX_WIDTH)
            pos = self._alloc(w, h)
        if pos is None:
            raise RuntimeError(
                f"image atlas overflow: live images exceed "
                f"{self.width}x{self.MAX_HEIGHT}")
        self.entries[key] = [pos[0], pos[1], w, h, self.generation, img]
        self._dirty.append(key)
        return tuple(self.entries[key][:4])

    def array(self) -> np.ndarray:
        if not self.entries:
            return np.zeros((1, 1, 4), dtype=np.float32)
        # pad the height to a tier so atlas growth doesn't retrace the
        # pipeline at every new image
        hpad = 64
        while hpad < self.height:
            hpad *= 2
        cached = self._packed
        grown = cached is not None and (
            cached.shape[0] < hpad or cached.shape[1] != self.width)
        if cached is None or self._needs_rebuild:
            out = np.zeros((hpad, self.width, 4), dtype=np.float32)
            self._dirty = list(self.entries.keys())
            self.rebuilds += 1
        elif grown:
            # position-stable growth: copy the old page into the larger
            # canvas, then blit only the new entries
            out = np.zeros((hpad, self.width, 4), dtype=np.float32)
            out[:cached.shape[0], :cached.shape[1]] = cached
        elif self._dirty:
            # copy-on-write so arrays returned earlier stay immutable
            out = cached.copy()
        else:
            return cached
        for k in self._dirty:
            e = self.entries.get(k)
            if e is None:
                continue
            x, y, w, h, _, img = e
            rgba = img.data.astype(np.float32) / 255.0
            rgba[..., :3] *= rgba[..., 3:4]  # premultiply
            out[y:y + h, x:x + w] = rgba
        self._dirty = []
        self._needs_rebuild = False
        self._packed = out
        return out


def _estimate(decoded, transforms, params: RenderParams):
    """Host-side capacity estimation (BumpEstimator analog, estimate.rs).

    Uses Wang-bound line counts and control-polygon length bounds; all
    vectorised numpy over the segment arrays.
    """
    pts = decoded["points"].astype(np.float64)      # (S, 4, 2)
    kind = decoded["kind"]
    t = decoded["transform"].astype(np.float64)     # (S, 6)
    n = len(kind)
    if n == 0:
        return 0, 0, 0, 0, np.zeros((0, 4), np.int32), MAX_LINES_PER_SEG
    hw = decoded.get("hw")
    any_stroke = hw is not None and len(hw) and (hw > 0).any()
    # Pathological-segment detection: raise the frame's per-segment cap to
    # the unclamped Wang bound (device + oracle + this estimator all use
    # the raised cap, so huge single curves keep the flatten tolerance).
    # Second differences are VECTORS — the affine translation cancels —
    # so only the 2x2 linear part applies: ~6x cheaper than materializing
    # transformed control points (57 ms -> <10 ms at mmark-30k).
    from .host_flatten import max_lines_for_wang_m
    d1 = pts[:, 0] - 2.0 * pts[:, 1] + pts[:, 2]
    d2 = pts[:, 1] - 2.0 * pts[:, 2] + pts[:, 3]
    # quads elevate with second difference (p0-2p1+p2)/3 at both d1/d2
    quad = (kind == 2)[:, None]
    d1 = np.where(quad, (pts[:, 0] - 2.0 * pts[:, 1] + pts[:, 2]) / 3.0, d1)
    d2 = np.where(quad, d1, d2)
    dx1 = d1[:, 0] * t[:, 0] + d1[:, 1] * t[:, 2]
    dy1 = d1[:, 0] * t[:, 1] + d1[:, 1] * t[:, 3]
    dx2 = d2[:, 0] * t[:, 0] + d2[:, 1] * t[:, 2]
    dy2 = d2[:, 0] * t[:, 1] + d2[:, 1] * t[:, 3]
    m = 6.0 * np.maximum(np.hypot(dx1, dy1), np.hypot(dx2, dy2))
    m = np.where(kind > 1, m, 0.0)
    max_lines = max_lines_for_wang_m(float(m.max()) if len(m) else 0.0,
                                     FLATTEN_TOL)
    from .. import native
    if native.available():
        # C++ streaming estimator: same math, none of the numpy
        # first-touch allocation cost (seconds at mmark-30k scale);
        # stroked segments estimate through the scalar port of the
        # device stroke expansion (round 5 — the numpy stroke path cost
        # ~6 s at stroked mmark-30k).
        got = native.estimate(
            decoded["points"], kind, decoded["transform"],
            decoded["path_ix"], decoded["n_paths"],
            params.width_tiles + 1, params.height_tiles,
            TILE_W, TILE_H, FLATTEN_TOL, max_lines,
            hw=hw if any_stroke else None,
            join=decoded.get("join") if any_stroke else None)
        if got is not None:
            return got + (max_lines,)
    if any_stroke:
        from .host_flatten import elevate_to_cubic, transform_points
        _cub64 = elevate_to_cubic(transform_points(pts, t), kind)
    # Transform control points.
    x = pts[..., 0] * t[:, None, 0] + pts[..., 1] * t[:, None, 2] + t[:, None, 4]
    y = pts[..., 0] * t[:, None, 1] + pts[..., 1] * t[:, None, 3] + t[:, None, 5]
    tp = np.stack([x, y], axis=-1)
    # Wang counts (same math as the device flatten).
    d1 = tp[:, 0] - 2 * tp[:, 1] + tp[:, 2]
    d2 = tp[:, 1] - 2 * tp[:, 2] + tp[:, 3]
    l_quad = 2.0 * np.hypot(d1[:, 0], d1[:, 1])
    l_cub = 6.0 * np.maximum(np.hypot(d1[:, 0], d1[:, 1]),
                             np.hypot(d2[:, 0], d2[:, 1]))
    l = np.where(kind == 3, l_cub, np.where(kind == 2, l_quad, 0.0))
    counts = np.ceil(np.sqrt(l / (8.0 * FLATTEN_TOL)))
    counts = np.clip(counts, 1, max_lines).astype(np.int64)
    counts = np.where(kind == 1, 1, counts)
    if any_stroke:
        from .host_flatten import STROKE_SLOTS, stroke_mini_counts_np
        det = t[:, 0] * t[:, 3] - t[:, 1] * t[:, 2]
        hw_dev = hw.astype(np.float64) * np.sqrt(np.abs(det))
        m = stroke_mini_counts_np(_cub64, hw_dev, FLATTEN_TOL, max_lines)
        counts = np.where((hw_dev > 0) & (kind > 0), m * STROKE_SLOTS,
                          counts)
    est_lines = int(counts.sum())
    # Exact touch counts: actually flatten (same uniform-t math as the
    # device) and evaluate the span arithmetic per line. This keeps the
    # touch tier tight — a loose bound inflates every touch-proportional
    # device stage by the padding ratio.
    from .host_flatten import flatten_decoded
    lines, line_path_map = flatten_decoded(decoded)
    lx0, ly0 = lines[:, 0].astype(np.float64), lines[:, 1].astype(np.float64)
    lx1, ly1 = lines[:, 2].astype(np.float64), lines[:, 3].astype(np.float64)
    sx0, sx1 = lx0 / TILE_W, lx1 / TILE_W
    sy0, sy1 = ly0 / TILE_H, ly1 / TILE_H

    def span(a, b):
        return np.maximum(np.ceil(np.maximum(a, b))
                          - np.floor(np.minimum(a, b)), 1.0)

    per_line = span(sx0, sx1) - 1.0 + span(sy0, sy1)
    # viewport clipping can only shrink spans; edge verticals add ≤ span_y
    est_touches = int(per_line.sum() + len(lines) // 64) + 512
    npts = kind + 1
    # Path-tile rects: per-path clamped bbox of the FLATTENED lines (exact,
    # tighter than the control hull for curves), padded by 0.5 px to cover
    # the device's f32 flatten against this f64 computation.
    lp = line_path_map
    path_ix = decoded["path_ix"]
    n_paths = decoded["n_paths"]
    big = 1e30
    minx = np.full(n_paths + 1, big)
    miny = np.full(n_paths + 1, big)
    maxx = np.full(n_paths + 1, -big)
    maxy = np.full(n_paths + 1, -big)
    pad = 0.5
    for xs, ys in ((lx0, ly0), (lx1, ly1)):
        np.minimum.at(minx, lp, xs - pad)
        np.minimum.at(miny, lp, ys - pad)
        np.maximum.at(maxx, lp, xs + pad)
        np.maximum.at(maxy, lp, ys + pad)
    wt1 = params.width_tiles + 1  # pipeline allocates one guard column
    tx0 = np.clip(np.floor(minx[:n_paths] / TILE_W), 0, wt1)
    ty0 = np.clip(np.floor(miny[:n_paths] / TILE_H), 0, params.height_tiles)
    tx1 = np.clip(np.ceil(maxx[:n_paths] / TILE_W), 0, wt1)
    ty1 = np.clip(np.ceil(maxy[:n_paths] / TILE_H), 0, params.height_tiles)
    ty1 = np.maximum(ty1, ty0)
    tx1 = np.maximum(tx1, tx0)
    empty = ~np.isfinite(minx[:n_paths]) | (minx[:n_paths] > maxx[:n_paths])
    rect = np.stack([tx0, ty0, tx1, ty1], axis=-1).astype(np.int32)
    rect[empty] = 0
    areas = np.maximum(tx1 - tx0, 0) * np.maximum(ty1 - ty0, 0)
    areas[empty] = 0
    est_path_tiles = int(areas.sum()) + n_paths
    # Live-tile bound: per (path, tile-row) hull of touched x-tiles.
    # Interior (backdrop) tiles always lie between two crossings of that
    # row, and winding is exactly 0 right of a closed contour's last
    # crossing, so live fragments = {coverage != 0} is a subset of the
    # per-row hull. Summing hull widths gives a true upper bound that is
    # far tighter than the bbox for diagonal/sparse geometry (enables
    # fragment culling: PipelineStatic.n_live).
    ht1 = params.height_tiles + 1
    ry0 = np.clip(np.floor(np.minimum(sy0, sy1) - pad / TILE_H),
                  0, ht1 - 1).astype(np.int64)
    ry1 = np.clip(np.ceil(np.maximum(sy0, sy1) + pad / TILE_H),
                  1, ht1).astype(np.int64)
    nrow = np.maximum(ry1 - ry0, 1)
    rep = np.repeat(np.arange(len(lines)), nrow)
    offs = np.arange(nrow.sum()) - np.repeat(np.cumsum(nrow) - nrow, nrow)
    rows = ry0[rep] + offs
    key = lp[rep] * ht1 + rows
    nk = (n_paths + 1) * ht1
    # Per (line, row) x-interval: interpolate the line at the row's y-span
    # boundaries (a long line's x-range per row is a thin slice of its
    # total x-range — using the whole range would inflate the bound back
    # to the bbox for long diagonals). Horizontal lines (dy ~ 0) live in
    # one row; their full x-range is the correct hull there.
    rsy0, rsy1 = sy0[rep], sy1[rep]
    rsx0, rsx1 = sx0[rep], sx1[rep]
    slo = np.minimum(rsy0, rsy1)
    shi = np.maximum(rsy0, rsy1)
    ya = np.clip(rows.astype(np.float64), slo, shi)
    yb = np.clip(rows.astype(np.float64) + 1.0, slo, shi)
    dy = rsy1 - rsy0
    safe_dy = np.where(np.abs(dy) > 1e-12, dy, 1.0)
    ta = np.clip((ya - rsy0) / safe_dy, 0.0, 1.0)
    tb = np.clip((yb - rsy0) / safe_dy, 0.0, 1.0)
    horiz = np.abs(dy) <= 1e-12
    xa = np.where(horiz, np.minimum(rsx0, rsx1), rsx0 + ta * (rsx1 - rsx0))
    xb = np.where(horiz, np.maximum(rsx0, rsx1), rsx0 + tb * (rsx1 - rsx0))
    padx = pad / TILE_W
    kx0 = np.clip(np.floor(np.minimum(xa, xb) - padx), 0, wt1)
    kx1 = np.clip(np.ceil(np.maximum(xa, xb) + padx), 0, wt1)
    hmin = np.full(nk, 1e9)
    hmax = np.full(nk, -1e9)
    np.minimum.at(hmin, key, kx0)
    np.maximum.at(hmax, key, kx1)
    est_live = int(np.maximum(hmax - hmin, 0).sum(where=hmax >= hmin))
    return (est_lines, est_touches, est_path_tiles, est_live, rect,
            max_lines)


class Resolver:
    """Persistent resolver: retains the gradient-ramp cache and image atlas
    across frames (the reference's ``Resolver`` owns RampCache / ImageCache /
    GlyphCache between frames, resolve.rs:183, ramp_cache.rs:13). For
    animated/retained scenes this keeps LUT rows and atlas slots stable so
    the device buffers don't change shape frame to frame."""

    def __init__(self):
        self.ramp_cache = RampCache()
        self.atlas = ImageAtlas()

    def resolve(self, encoding: Encoding,
                params: RenderParams) -> "ResolvedScene":
        self.atlas.begin_generation()
        return _resolve_impl(encoding, params, self.ramp_cache, self.atlas)


def resolve(encoding: Encoding, params: RenderParams) -> ResolvedScene:
    """One-shot resolve with fresh caches."""
    return _resolve_impl(encoding, params, RampCache(), ImageAtlas())


def _resolve_impl(encoding: Encoding, params: RenderParams,
                  ramp_cache: "RampCache",
                  atlas: "ImageAtlas") -> ResolvedScene:
    tags, data, transforms, styles = encoding.packed_streams()
    styles_hw = encoding.style_hw_array()
    decoded = decode_segments(tags, data, transforms, styles,
                              style_hw=styles_hw)
    n_paths = encoding.n_paths
    has_stroke = bool(len(decoded["hw"]) and (decoded["hw"] > 0).any())

    # per-path transform (first segment of each path wins) — one vectorised
    # pass; np.unique(return_index) gives each path's first segment.
    path_tmat = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32),
                        (max(n_paths, 1), 1))
    first_seg = None
    if len(decoded["path_ix"]):
        pix = decoded["path_ix"]
        uniq, first_ix = np.unique(pix, return_index=True)
        valid = (uniq >= 0) & (uniq < n_paths)
        uniq, first_ix = uniq[valid], first_ix[valid]
        path_tmat[uniq] = decoded["transform"][first_ix]
        first_seg = (uniq, first_ix)


    P = max(n_paths, 1)
    paint_kind = np.zeros(P, dtype=np.int32)
    fill_rule = np.zeros(P, dtype=np.int32)
    color = np.zeros((P, 4), dtype=np.float32)
    grad_rec = np.zeros((P, 12), dtype=np.float32)
    paint_inv = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), (P, 1))
    image_rec = np.zeros((P, 8), dtype=np.float32)
    blur_rec = np.zeros((P, 8), dtype=np.float32)
    path_kind = np.zeros(P, dtype=np.int32)

    draw_kind = np.zeros(max(len(encoding.draws), 1), dtype=np.int32)
    draw_path_ix = np.full(max(len(encoding.draws), 1), -1, dtype=np.int32)
    draw_path_n = np.zeros(max(len(encoding.draws), 1), dtype=np.int32)
    layers: List[LayerInfo] = []
    image_paints: List[tuple] = []
    atlas_evictions0 = atlas.evictions

    # Per-path fill rule from the style stream via first segment (same
    # vectorised first-occurrence pass as the transforms above).
    if first_seg is not None:
        uniq, first_ix = first_seg
        fill_rule[uniq] = decoded["fill_rule"][first_ix]

    path_cursor = 0
    for d, rec in enumerate(encoding.draws):
        draw_kind[d] = rec.kind
        if rec.kind == DRAW_END_LAYER:
            layers.append(LayerInfo(d, 0, 0, 1.0, -1, 0))
            continue
        if rec.kind == DRAW_BEGIN_LAYER:
            clip_ix = -1
            if rec.has_path:
                clip_ix = path_cursor
                path_kind[clip_ix] = 1
                draw_path_ix[d] = clip_ix
                path_cursor += 1
            blend = rec.blend or BlendMode()
            layers.append(LayerInfo(d, int(blend.mix), int(blend.compose),
                                    rec.alpha, clip_ix, rec.fill_rule,
                                    rec.layer_filter))
            continue
        if rec.batch_colors is not None:
            # Batched solid fills (Scene.fill_batch): one record covers N
            # consecutive paths; premultiply + assign the block vectorised.
            bc = rec.batch_colors
            nb = bc.shape[0]
            p = path_cursor
            path_cursor += nb
            draw_path_ix[d] = p
            draw_path_n[d] = nb
            paint_kind[p:p + nb] = PAINT_COLOR
            pm = bc.copy()
            pm[:, :3] *= pm[:, 3:4]
            color[p:p + nb] = pm
            continue
        # geometric draw
        p = path_cursor
        path_cursor += 1
        draw_path_ix[d] = p
        draw_path_n[d] = 1
        tmat = Affine(tuple(float(v) for v in path_tmat[p]))
        brush_t = tmat if rec.brush_transform is None \
            else tmat @ rec.brush_transform
        if rec.kind == DRAW_BLUR_RECT:
            paint_kind[p] = PAINT_BLUR_RECT
            c = rec.brush if isinstance(rec.brush, Color) else Color(0, 0, 0)
            color[p] = c.premultiplied()
            blur_rec[p, 0:4] = rec.blur_rect
            blur_rec[p, 4] = rec.blur_radius
            blur_rec[p, 5] = rec.blur_std_dev
            blur_rec[p, 6] = 1.0 if rec.blur_inverse else 0.0
            paint_inv[p] = np.asarray(brush_t.inverse().coeffs,
                                      dtype=np.float32)
        elif isinstance(rec.brush, Color):
            paint_kind[p] = PAINT_COLOR
            color[p] = rec.brush.premultiplied()
        elif isinstance(rec.brush, Gradient):
            paint_kind[p] = PAINT_GRADIENT
            row = ramp_cache.add(rec.brush.stops,
                             getattr(rec.brush, "alpha_space",
                                     "unpremultiplied"))
            grad_rec[p] = pack_gradient(rec.brush, row)
            paint_inv[p] = np.asarray(brush_t.inverse().coeffs,
                                      dtype=np.float32)
        elif isinstance(rec.brush, Image):
            paint_kind[p] = PAINT_IMAGE
            img = rec.brush
            x, y, w, h = atlas.add(img)
            image_rec[p] = [x, y, w, h, int(img.x_extend),
                            int(img.y_extend), int(img.quality), img.alpha]
            image_paints.append((p, img))
            paint_inv[p] = np.asarray(brush_t.inverse().coeffs,
                                      dtype=np.float32)

    if image_paints and atlas.evictions != atlas_evictions0:
        # an eviction fired MID-resolve: the repack relocated entries
        # added earlier in this loop, so their recorded positions are
        # stale — re-query (cheap dedup hits; current-generation entries
        # are all resident now)
        for p, img in image_paints:
            x, y, w, h = atlas.add(img)
            image_rec[p][:4] = [x, y, w, h]

    (est_lines, est_touches, est_path_tiles, est_live, path_rect,
     max_lines) = _estimate(
        decoded, transforms, params)
    has_left_edge = _hull_crosses_left_edge(decoded)
    est_edges = 0
    if has_left_edge:
        est_edges, est_edge_touches = _estimate_edges(decoded)
        # every edge slot emits >= 1 touch (dummies for dead slots), and
        # the slot capacity is padded by tier_for — bill the worst case
        est_touches += est_edge_touches + est_edges + 512
    if len(path_rect) < P:
        path_rect = np.concatenate(
            [path_rect, np.zeros((P - len(path_rect), 4), np.int32)])

    # Fold the affine into the control points HOST-side: a (S, 6) f32
    # transform row per segment was 30% of the scene upload (3.15 MB at
    # mmark-30k through the tunneled backend) to redo on device what one
    # vectorized numpy pass does here. Stroke half-widths pre-scale by
    # sqrt(|det|) (uniform-scale pen; the same formula the device used).
    _t = decoded["transform"]
    _p = decoded["points"]
    _sx = _p[..., 0] * _t[:, None, 0] + _p[..., 1] * _t[:, None, 2] \
        + _t[:, None, 4]
    _sy = _p[..., 0] * _t[:, None, 1] + _p[..., 1] * _t[:, None, 3] \
        + _t[:, None, 5]
    seg_pts_t = np.stack([_sx, _sy], axis=-1).astype(np.float32)
    _det = _t[:, 0] * _t[:, 3] - _t[:, 1] * _t[:, 2]
    seg_hw_t = (decoded["hw"] * np.sqrt(np.abs(_det))).astype(np.float32)

    return ResolvedScene(
        tags=tags, data=data, transforms=transforms, styles=styles,
        n_paths=n_paths, n_segs=encoding.n_path_segments,
        draw_kind=draw_kind, draw_path_ix=draw_path_ix,
        draw_path_n=draw_path_n, layers=layers,
        paint_kind=paint_kind, fill_rule=fill_rule, color=color,
        grad_rec=grad_rec, paint_inv=paint_inv, image_rec=image_rec,
        blur_rec=blur_rec, path_kind=path_kind, path_rect=path_rect,
        seg_pts=seg_pts_t,
        seg_path=decoded["path_ix"].astype(np.int32),
        seg_kind=decoded["kind"].astype(np.int32),
        seg_hw=seg_hw_t,
        seg_join=decoded["join"].astype(np.int32),
        styles_hw=styles_hw.astype(np.float32),
        has_stroke=has_stroke,
        ramps=ramp_cache.array(), atlas=atlas.array(),
        est_lines=est_lines, est_touches=est_touches, max_lines=max_lines,
        est_path_tiles=est_path_tiles, est_live=est_live,
        est_edges=est_edges, has_left_edge=has_left_edge)


def _estimate_edges(decoded):
    """Exact-ish count of left-edge verticals: flatten on host (f64) and
    count lines crossing x = EDGE_EPS, plus their touch spans. Only runs
    for scenes whose hull reaches the left boundary."""
    from .host_flatten import flatten_decoded
    lines, _ = flatten_decoded(decoded)
    if not len(lines):
        return 0, 0
    lo = 1.0 / 64.0
    x0, x1 = lines[:, 0], lines[:, 2]
    crossing = (np.minimum(x0, x1) < lo) & (np.maximum(x0, x1) > lo)
    n = int(crossing.sum())
    ys = np.abs(lines[crossing, 3] - lines[crossing, 1]) / TILE_H
    return n, int(np.ceil(ys).sum()) + 2 * n


def _hull_crosses_left_edge(decoded) -> bool:
    """Conservative: does ANY transformed control hull reach x < EDGE_EPS?
    The flattened lines lie inside the control hull, so a hull min-x at or
    right of the boundary guarantees no left-edge vertical is emitted
    (flatten.wgsl's viewport-clamp winding carriers, ops/flatten.py)."""
    kind = decoded["kind"]
    if len(kind) == 0:
        return False
    pts = decoded["points"].astype(np.float64)
    t = decoded["transform"].astype(np.float64)
    x = pts[..., 0] * t[:, None, 0] + pts[..., 1] * t[:, None, 2] \
        + t[:, None, 4]
    npts = np.where(kind == 1, 2, np.where(kind == 2, 3,
                    np.where(kind == 3, 4, 0)))
    mask = np.arange(4)[None, :] < npts[:, None]
    mn = np.where(mask, x, np.inf).min()
    return bool(mn < (1.0 / 64.0) + 0.5)
