"""The jitted end-to-end render pipeline (single frame, single device).

One XLA program per (capacity tier, viewport, paint-kind set) replaces the
reference's ~18-dispatch recording + WgpuEngine (``vello/src/render.rs:135-557``,
``wgpu_engine.rs``): XLA owns scheduling, fusion, and buffers; overflow flags
replace ``BumpAllocators.failed`` and drive the host-side retry-at-next-tier
loop (the reference's robust-memory protocol, ``vello/src/lib.rs:717-783``).

Stage order (TPU formulation of the classic pipeline, SURVEY.md §2.2):
  pathtag cumsum-scan -> decode -> flatten(+viewport clip) -> path bboxes &
  tile alloc (segment min/max + cumsum) -> touch expansion (DDA closed form)
  -> backdrop scatter + row prefix -> touch sort -> per-fragment winding ->
  fill rule -> paint -> (gtile, order) sort -> transmittance composite.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..encoding.config import Capacities, TILE_H, TILE_W
from ..ops import fine_xla, flatten as flatten_ops, pathtag, tiling


@dataclass(frozen=True)
class PipelineStatic:
    caps_key: Tuple[int, ...]
    width: int
    height: int
    kinds_present: Tuple[int, ...]

    @property
    def width_tiles(self):
        return (self.width + TILE_W - 1) // TILE_W

    @property
    def height_tiles(self):
        return (self.height + TILE_H - 1) // TILE_H


def render_frame(bufs: dict, static: PipelineStatic, stripe=None):
    """bufs: dict of padded device arrays (see models/renderer.py pack()).

    stripe: optional (ty_lo, ht_local) — composite only the tile rows
    [ty_lo, ty_lo + ht_local) and return that horizontal stripe of the image
    (the sequence-parallel axis for multi-chip rendering; ty_lo may be a
    traced value, ht_local must be static).

    Returns (image (H, W, 4) premultiplied f32, overflow flags i32).
    """
    caps = Capacities(*static.caps_key)
    H = float(static.height)
    WT, HT = static.width_tiles, static.height_tiles
    # Allocate one extra tile column so the x-clamp boundary (which deforms
    # crossing geometry) sits outside the visible area.
    WT_alloc = WT + 1
    W = float(WT_alloc * TILE_W)
    n_gtiles = WT * HT

    decoded = pathtag.decode_and_transform(
        bufs["tags"], bufs["data"], bufs["transforms"], bufs["styles"])

    n_edge = max(caps.n_lines // 4, 256)
    fl = flatten_ops.flatten(decoded, caps.n_lines, n_edge, W, H)
    lines = jnp.concatenate([fl["lines"], fl["edge_lines"]], axis=0)
    lpath = jnp.concatenate([fl["line_path"], fl["edge_path"]], axis=0)

    rects = tiling.path_tile_rects(
        fl["lines"], fl["edge_lines"], fl["line_path"], fl["edge_path"],
        caps.n_paths, WT_alloc, HT)
    overflow_tiles = (rects["total_tiles"] > caps.n_path_tiles
                      ).astype(jnp.int32)

    touches = tiling.make_touches(lines, lpath, rects, caps.n_touches)
    backdrop = tiling.backdrop_prefix(
        touches["backdrop_idx"], touches["backdrop_val"], rects,
        caps.n_path_tiles)

    # --- sort touches by flat tile (the "coarse" sort) ---
    tix = jnp.arange(caps.n_touches, dtype=jnp.int32)
    ftile_s, tix_s = jax.lax.sort((touches["ftile"], tix), num_keys=1)
    seg_s = touches["seg"][tix_s]
    yedge_s = touches["y_edge"][tix_s]
    cov = fine_xla.coverage_delta(seg_s, yedge_s)
    seg_ids = jnp.clip(ftile_s, 0, caps.n_path_tiles)
    frag_cov = jax.ops.segment_sum(
        cov, seg_ids, num_segments=caps.n_path_tiles + 1,
        indices_are_sorted=True)[:caps.n_path_tiles]

    # --- per flat tile metadata ---
    t = jnp.arange(caps.n_path_tiles, dtype=jnp.int32)
    incl = rects["base"] + rects["areas"]
    tpath = jnp.searchsorted(incl, t, side="right").astype(jnp.int32)
    tpath = jnp.clip(tpath, 0, caps.n_paths - 1)
    tvalid = (t < rects["total_tiles"]) & (bufs["path_kind"][tpath] == 0)
    stride = jnp.maximum(rects["stride"][tpath], 1)
    rel = t - rects["base"][tpath]
    tx = rects["tx0"][tpath] + rel % stride
    ty = rects["ty0"][tpath] + rel // stride

    winding = backdrop[:, None, None].astype(jnp.float32) + frag_cov
    rule = bufs["fill_rule"][tpath][:, None, None]
    coverage = fine_xla.apply_fill_rule(winding, rule)
    coverage = jnp.where(tvalid[:, None, None], coverage, 0.0)

    src = fine_xla.eval_paints(
        (tx * TILE_W).astype(jnp.float32), (ty * TILE_H).astype(jnp.float32),
        bufs["paint_kind"][tpath], bufs["color"][tpath],
        bufs["grad_rec"][tpath], bufs["paint_inv"][tpath],
        bufs["image_rec"][tpath], bufs["blur_rec"][tpath],
        bufs["ramps"], bufs["atlas"], frozenset(static.kinds_present))
    src = src * coverage[..., None]

    # --- composite: sort fragments by (global tile, draw order) ---
    if stripe is None:
        ty_lo, ht_local = 0, HT
    else:
        ty_lo, ht_local = stripe
    n_loc = WT * ht_local
    owned = tvalid & (tx < WT) & (ty >= ty_lo) & (ty < ty_lo + ht_local)
    gtile = jnp.where(owned, (ty - ty_lo) * WT + tx, n_loc)
    g_s, _, fidx_s = jax.lax.sort((gtile, tpath, t), num_keys=2)
    src_s = src[fidx_s]
    alpha_s = src_s[..., 3]
    base = bufs["base_color"]
    base_premul = jnp.concatenate([base[:3] * base[3], base[3:4]])
    tiles = fine_xla.composite_srcover(src_s, alpha_s, g_s, n_loc,
                                       base_premul)

    img = tiles.reshape(ht_local, WT, TILE_H, TILE_W, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(ht_local * TILE_H,
                                               WT * TILE_W, 4)
    if stripe is None:
        img = img[:static.height, :static.width]
    else:
        img = img[:, :static.width]
    overflow = fl["overflow"] + 4 * touches["overflow"] + 8 * overflow_tiles
    return img, overflow


_JIT_CACHE = {}


def get_pipeline(static: PipelineStatic):
    key = static
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(partial(render_frame, static=static))
    return _JIT_CACHE[key]
