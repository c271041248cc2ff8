"""Layered compositor: clip layers, group alpha, full mix/compose blending
on device.

The reference interleaves CMD_BEGIN_CLIP/CMD_END_CLIP in each tile's PTCL and
keeps a 4-deep in-register blend stack with spill (``fine.wgsl:1121-1143``,
``coarse.wgsl``). The TPU formulation hoists the layer structure out of the
per-tile stream: the host flattens the scene's layer tree into a static *plan*
(a sequence of draws / push / pop ops — static in shape, dynamic in values),
and the device executes it as an unrolled sequence of whole-frame tile-buffer
operations:

  draws(lo, hi): transmittance src-over composite of the fragments whose
                 path index is in [lo, hi) over the top buffer;
  push:          new transparent buffer (+ the clip path's per-tile coverage
                 assembled from its fragments);
  pop:           blend_mix_compose(parent, top*alpha) masked by clip coverage.

Each op is dense, fully parallel tile work; the sequential dimension is the
layer count (static), not the fragment count. Mix/compose are static per op
(part of the compile key); alpha and path ranges are dynamic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..encoding.config import TILE_H, TILE_W
from ..encoding.encoding import DRAW_BEGIN_LAYER, DRAW_END_LAYER
from ..ops import blend as blend_ops
from ..ops import fine_xla
from ..ops.segmented import segment_sum_sorted
from .render import PipelineStatic, _tiles_to_image, prepare_fragments

# op kinds
OP_DRAWS = 0
OP_PUSH = 1
OP_POP = 2


@dataclass(frozen=True)
class LayerPlanStatic:
    """Static shape of the layer plan: op kinds + per-pop (mix, compose) +
    per-push has_clip, + max stack depth."""

    ops: Tuple[Tuple, ...]  # (kind, mix, compose, filter_tuple) per op
    max_depth: int


def build_layer_plan(rs) -> Tuple[LayerPlanStatic, dict]:
    """Host: flatten the draw stream into the static plan + dynamic values.

    rs: ResolvedScene. Returns (plan_static, plan_dynamic) where dynamic has
    draw ranges (n_draws_ops, 2) i32, clip path ix (n_push,) i32 and alpha
    (n_push,) f32.
    """
    ops = []
    ranges = []
    clip_ixs = []
    alphas = []
    # walk draws; geometric draws between layer events form a range
    li = 0
    run_lo = 0
    path_cursor = 0
    depth = 0
    max_depth = 0
    # stack of (mix, compose) to attach at pops
    stack = []
    def flush_draws():
        nonlocal run_lo
        ops.append((OP_DRAWS, 0, 0, None))
        ranges.append((run_lo, path_cursor))
        run_lo = path_cursor

    for d in range(len(rs.draw_kind)):
        k = int(rs.draw_kind[d])
        if k == DRAW_BEGIN_LAYER:
            info = rs.layers[li]
            li += 1
            flush_draws()
            if info.clip_path_ix >= 0:
                path_cursor += 1  # the clip path consumes a path slot
            run_lo = path_cursor
            ops.append((OP_PUSH, 0, 0, None))
            clip_ixs.append(info.clip_path_ix)
            alphas.append(info.alpha)
            stack.append((info.mix, info.compose, info.layer_filter))
            depth += 1
            max_depth = max(max_depth, depth)
        elif k == DRAW_END_LAYER:
            li += 1
            flush_draws()
            mix, compose, lfilter = stack.pop() if stack else (0, 3, None)
            ops.append((OP_POP, mix, compose,
                        tuple(lfilter) if lfilter else None))
            depth = max(depth - 1, 0)
        else:
            if int(rs.draw_path_ix[d]) >= 0:
                path_cursor += 1
    flush_draws()
    # unbalanced pushes: drop their content (reference drops open layers)
    while stack:
        ops.append((OP_POP, -1, -1, None))  # -1 = discard
        stack.pop()
    static = LayerPlanStatic(ops=tuple(ops), max_depth=max(max_depth, 1))
    dynamic = {
        "ranges": jnp.asarray(ranges or [(0, 0)], dtype=jnp.int32),
        "clip_ix": jnp.asarray(clip_ixs or [0], dtype=jnp.int32),
        "alpha": jnp.asarray(alphas or [1.0], dtype=jnp.float32),
    }
    return static, dynamic


def render_frame_layered(bufs: dict, plan_dyn: dict, static: PipelineStatic,
                         plan: LayerPlanStatic, stripe=None):
    fr = prepare_fragments(bufs, static, stripe, keep_clip_paths=True)
    n_loc = fr["n_loc"]
    npx = TILE_H * TILE_W
    base = bufs["base_color"]
    base_premul = jnp.concatenate([base[:3] * base[3], base[3:4]])
    bottom = jnp.broadcast_to(base_premul[None, :, None], (n_loc, 4, npx))

    stack = [bottom]
    clips = []  # per-push clip coverage or None
    d_i = 0  # draws op index
    p_i = 0  # push op index
    for kind, mix, compose, lfilter in plan.ops:
        if kind == OP_DRAWS:
            lo = plan_dyn["ranges"][d_i, 0]
            hi = plan_dyn["ranges"][d_i, 1]
            d_i += 1
            m = (fr["tpath_s"] >= lo) & (fr["tpath_s"] < hi)
            alpha = jnp.where(m[:, None], fr["alpha_s"], 0.0)
            src = jnp.where(m[:, None, None], fr["src_s"], 0.0)
            stack[-1] = fine_xla.composite_srcover_over(
                src, alpha, fr["g_s"], stack[-1])
        elif kind == OP_PUSH:
            cix = plan_dyn["clip_ix"][p_i]
            alpha = plan_dyn["alpha"][p_i]
            p_i += 1
            # Clip coverage per tile: the clip path's fragments' coverage
            # (each (path,tile) unique, so segmented sum == select).
            # Mask VALUES, not ids — segment_sum_sorted needs ids ascending.
            sel = fr["tpath_s"] == cix
            covs = jnp.where(sel[:, None], fr["coverage_s"], 0.0)
            ccov = segment_sum_sorted(covs, fr["g_s"], n_loc)  # (G, NPX)
            has_clip = cix >= 0
            ccov = jnp.where(has_clip, ccov, 1.0)
            clips.append((ccov, alpha))
            stack.append(jnp.zeros((n_loc, 4, npx), dtype=jnp.float32))
        else:  # OP_POP
            top = stack.pop()
            if mix < 0:  # unbalanced push: discard content
                if clips:
                    clips.pop()
                continue
            if lfilter is not None:
                # whole-frame filter on the layer buffer (tiles -> image ->
                # filter -> tiles; filters are cross-tile operations)
                from ..ops.filters import apply_filter
                WT = static.width_tiles
                ht = fr["ht_local"]
                im = top.reshape(ht, WT, 4, TILE_H, TILE_W)
                im = im.transpose(0, 3, 1, 4, 2).reshape(
                    ht * TILE_H, WT * TILE_W, 4)
                im = apply_filter(jnp, im, int(lfilter[0]), lfilter[1:])
                top = im.reshape(ht, TILE_H, WT, TILE_W, 4).transpose(
                    0, 2, 4, 1, 3).reshape(n_loc, 4, npx)
            ccov, alpha = clips.pop()
            parent = stack[-1]
            c = ccov[:, None, :]
            if mix == 127:  # LUMINANCE_MASK (fine.wgsl:1150-1165)
                fg = top * c * alpha
                masked = blend_ops.luminance_mask(
                    jnp, parent.transpose(0, 2, 1),
                    fg.transpose(0, 2, 1)).transpose(0, 2, 1)
                stack[-1] = jnp.where(c > 0.0, masked, parent)
            else:
                src = top * alpha
                # blend ops are channel-last; pops touch few buffers, so
                # transposes are cheap relative to the per-fragment stages.
                blended = blend_ops.blend_mix_compose(
                    jnp, parent.transpose(0, 2, 1), src.transpose(0, 2, 1),
                    mix, compose).transpose(0, 2, 1)
                stack[-1] = parent * (1.0 - c) + blended * c

    tiles = stack[0]
    img = _tiles_to_image(tiles, static, fr["ht_local"], stripe is None)
    return img, fr["overflow"]


_JIT_CACHE = {}


def get_layered_pipeline(static: PipelineStatic, plan: LayerPlanStatic):
    key = (static, plan)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            partial(render_frame_layered, static=static, plan=plan))
    return _JIT_CACHE[key]
