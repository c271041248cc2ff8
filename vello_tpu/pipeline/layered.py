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
class LayerPlanScanKey:
    """Compile key of the plan-as-data layered pipeline: only BUCKETED
    sizes — layer structure lives in data, so animated/deep structures
    reuse one executable (the round-1 compile-per-structure weakness)."""

    n_ops: int        # bucketed op count
    depth: int        # bucketed max stack depth
    n_clip_levels: int
    has_filter: bool = False  # any layer filter: adds ONE lax.switch over
                              # the dynamic-parameter filter suite to the
                              # pop op (params are data, so filtered layer
                              # structures share this executable too)
    n_draws: int = 0  # bucketed DRAWS-op count: sizes the op-partitioned
                      # composite walk tables (Pallas path only)


@dataclass(frozen=True)
class LayerPlanStatic:
    """Static shape of the layer plan: op kinds + per-pop (mix, compose) +
    per-push has_clip, + max stack depth + collapsed clip-chain levels."""

    ops: Tuple[Tuple, ...]  # (kind, mix, compose, filter_tuple) per op
    max_depth: int
    n_clip_levels: int = 0  # K of the collapsed per-path clip-chain table


_MAX_CHAIN = 8


def _build_layer_tree(rs):
    """Pass 1: draw stream -> layer tree. Children are ('draw', path_ix)
    tuples or child layer dicts."""
    root = {"children": [], "info": None, "parent": None, "discard": False}
    cur = root
    li = 0
    for d in range(len(rs.draw_kind)):
        k = int(rs.draw_kind[d])
        if k == DRAW_BEGIN_LAYER:
            info = rs.layers[li]
            li += 1
            node = {"children": [], "info": info, "parent": cur,
                    "discard": False}
            cur["children"].append(node)
            cur = node
        elif k == DRAW_END_LAYER:
            li += 1
            if cur["parent"] is not None:
                cur = cur["parent"]
        else:
            p = int(rs.draw_path_ix[d])
            if p >= 0:
                # batch records cover draw_path_n consecutive paths
                nb = int(rs.draw_path_n[d]) \
                    if getattr(rs, "draw_path_n", None) is not None else 1
                for pp in range(p, p + max(nb, 1)):
                    cur["children"].append(("draw", pp))
    # unbalanced open layers: content is discarded (reference drops them)
    while cur is not root:
        cur["discard"] = True
        cur = cur["parent"]
    return root


def _collect_chain(node):
    """If node is a collapsible clip chain — normal/clip mix, src-over,
    no filter, exactly one child all the way down to a single geometric
    draw — return (clip_slots, alpha_product, draw_path_ix). Masking a
    SINGLE draw by clip coverage and alpha commutes exactly with src-over
    compositing, so such layers need no tile buffers at all (the per-tile
    cheapness of the reference's PTCL clip commands)."""
    clips = []
    alpha = 1.0
    depth = 0
    while True:
        info = node["info"]
        if (node["discard"] or info.layer_filter is not None
                or int(info.mix) not in (0, 128) or int(info.compose) != 3
                or len(node["children"]) != 1 or depth >= _MAX_CHAIN):
            return None
        if info.clip_path_ix >= 0:
            clips.append(int(info.clip_path_ix))
        alpha *= float(info.alpha)
        child = node["children"][0]
        if isinstance(child, tuple):
            return clips, alpha, child[1]
        node = child
        depth += 1


def build_layer_plan(rs) -> Tuple[LayerPlanStatic, dict]:
    """Host: flatten the draw stream into the static plan + dynamic values.

    Collapsible clip chains become per-path clip-chain entries
    (path_clips / path_alpha) instead of push/pop ops — a scene of simple
    clips (reference many_clips) compiles to ONE draws op regardless of
    layer count. Returns (plan_static, plan_dynamic): dynamic has draw
    ranges (n_draws_ops, 2) i32, clip path ix (n_push,) i32, alpha
    (n_push,) f32, and — when chains collapsed — path_clipalpha
    (P, K+1) f32 [clip slots (-1 = none), alpha product].
    """
    import numpy as np
    root = _build_layer_tree(rs)

    ops = []
    ranges = []
    clip_ixs = []
    alphas = []
    P = max(int(len(rs.path_kind)), 1)
    path_clips = np.full((P, _MAX_CHAIN), -1, dtype=np.float32)
    path_alpha = np.ones(P, dtype=np.float32)
    max_k = 0
    state = {"run_lo": 0, "hi": 0, "depth": 0, "max_depth": 0}

    def flush():
        ops.append((OP_DRAWS, 0, 0, None))
        ranges.append((state["run_lo"], state["hi"]))
        state["run_lo"] = state["hi"]

    def emit(children):
        nonlocal max_k
        for ch in children:
            if isinstance(ch, tuple):
                state["hi"] = ch[1] + 1
                continue
            chain = _collect_chain(ch)
            if chain is not None:
                clips, alpha, p = chain
                path_clips[p, :len(clips)] = clips
                path_alpha[p] = alpha
                # a clipless opacity chain still needs the clipalpha
                # table (n_levels >= 1) or its alpha product is dropped
                max_k = max(max_k, len(clips), 1 if alpha != 1.0 else 0)
                state["hi"] = p + 1   # range spans the clip slots + draw;
                continue              # clip slots composite as no-ops
            info = ch["info"]
            flush()
            if info.clip_path_ix >= 0:
                state["hi"] = info.clip_path_ix + 1
            state["run_lo"] = state["hi"]
            ops.append((OP_PUSH, 0, 0, None))
            clip_ixs.append(int(info.clip_path_ix))
            alphas.append(float(info.alpha))
            state["depth"] += 1
            state["max_depth"] = max(state["max_depth"], state["depth"])
            emit(ch["children"])
            flush()
            if ch["discard"]:
                ops.append((OP_POP, -1, -1, None))
            else:
                ops.append((OP_POP, int(info.mix), int(info.compose),
                            tuple(info.layer_filter)
                            if info.layer_filter else None))
            state["depth"] -= 1
            state["run_lo"] = state["hi"]

    emit(root["children"])
    flush()
    # bucket K so chain-length changes don't recompile at every step
    k_lv = 0
    for b in (1, 2, 4, _MAX_CHAIN):
        if max_k <= b:
            k_lv = b if max_k else 0
            break
    static = LayerPlanStatic(ops=tuple(ops),
                             max_depth=max(state["max_depth"], 1),
                             n_clip_levels=k_lv)
    dynamic = {
        "ranges": jnp.asarray(ranges or [(0, 0)], dtype=jnp.int32),
        "clip_ix": jnp.asarray(clip_ixs or [0], dtype=jnp.int32),
        "alpha": jnp.asarray(alphas or [1.0], dtype=jnp.float32),
    }
    if k_lv:
        dynamic["path_clipalpha"] = jnp.asarray(
            np.concatenate([path_clips[:, :k_lv],
                            path_alpha[:, None]], axis=1))
    # --- plan-as-data encoding (scan pipeline) ---
    # op_tab rows: [kind, mix, compose, lo, hi, clip_ix]; kind 3 = NOP pad.
    n_ops = len(ops)
    nb = 4
    while nb < n_ops:
        nb *= 2
    tab = np.zeros((nb, 6), dtype=np.int32)
    tab[n_ops:, 0] = 3
    op_alpha = np.ones(nb, dtype=np.float32)
    op_filter = np.zeros((nb, 8), dtype=np.float32)
    d_i = p_i = 0
    for i, (kind, mix, compose, lf) in enumerate(ops):
        tab[i, 0] = kind
        tab[i, 1] = mix
        tab[i, 2] = compose
        if kind == OP_DRAWS:
            tab[i, 3:5] = ranges[d_i]
            d_i += 1
        elif kind == OP_PUSH:
            tab[i, 5] = clip_ixs[p_i]
            op_alpha[i] = alphas[p_i]
            p_i += 1
        elif kind == OP_POP and lf is not None:
            op_filter[i, :len(lf)] = lf
    dynamic["op_tab"] = jnp.asarray(tab)
    dynamic["op_alpha"] = jnp.asarray(op_alpha)
    dynamic["op_filter"] = jnp.asarray(op_filter)
    # draws-slot partition of path space: draws ranges are contiguous in
    # draw order (run_lo monotone), so slot(path) = #(draws_los <= path)-1.
    # Padded slots get a sentinel above every path index.
    n_draws = max(d_i, 1)
    nd = 4
    while nd < n_draws:
        nd *= 2
    dlos = np.full(nd, 2 ** 29, dtype=np.int32)
    dlos[:len(ranges)] = [r[0] for r in ranges]
    dynamic["draws_los"] = jnp.asarray(dlos)
    db = 2
    while db < static.max_depth:
        db *= 2
    has_filter = any(op[3] is not None for op in ops)
    scan_key = LayerPlanScanKey(n_ops=nb, depth=db, n_clip_levels=k_lv,
                                has_filter=has_filter, n_draws=nd)
    return static, dynamic, scan_key, has_filter


def _apply_clip_chains(fr, plan_dyn, n_levels: int) -> None:
    """Collapsed clip chains: multiply each fragment's coverage by its
    chain's clip-path coverages AT THE SAME TILE (plus the chain's alpha
    product). The clip fragment for (gtile, clip path) is found in the
    sorted fragment stream by key merge — no tile buffers."""
    from ..ops.segmented import lookup_sorted
    pca = plan_dyn["path_clipalpha"]            # (P, K+1) f32
    P = pca.shape[0]
    pc_g = pca[fr["tpath_s"]]                   # (F, K+1) row gather
    key = fr["g_s"] * (P + 1) + fr["tpath_s"]
    cov0 = fr["coverage_s"]
    cmul = pc_g[:, n_levels][:, None]           # alpha product
    for k in range(n_levels):
        cix = pc_g[:, k].astype(jnp.int32)
        q = jnp.where(cix >= 0, fr["g_s"] * (P + 1) + cix, -1)
        idx, found = lookup_sorted(key, q)
        ck = jnp.where((cix >= 0)[:, None],
                       jnp.where(found[:, None], cov0[idx], 0.0), 1.0)
        cmul = cmul * ck
    fr["coverage_s"] = cov0 * cmul
    fr["src_s"] = fr["src_s"] * cmul[:, None, :]
    fr["alpha_s"] = fr["alpha_s"] * cmul


def render_frame_layered_scan(bufs: dict, plan_dyn: dict,
                              static: PipelineStatic,
                              key: LayerPlanScanKey, stripe=None,
                              geom_axis=None, geom_shards: int = 1):
    """Plan-as-data layered compositor: ops are DATA driving a
    lax.fori_loop over a fixed-depth buffer stack — one executable per
    (bucketed op count, bucketed depth), however the layer structure
    changes frame to frame. Filters force the unrolled path instead."""
    fr = prepare_fragments(bufs, static, stripe, keep_clip_paths=True,
                           geom_axis=geom_axis, geom_shards=geom_shards)
    if key.n_clip_levels:
        _apply_clip_chains(fr, plan_dyn, key.n_clip_levels)
    n_loc = fr["n_loc"]
    npx = TILE_H * TILE_W
    base = bufs["base_color"]
    base_premul = jnp.concatenate([base[:3] * base[3], base[3:4]])
    D = key.depth + 1
    stack = jnp.zeros((D, n_loc, 4, npx), jnp.float32)
    stack = stack.at[0].set(
        jnp.broadcast_to(base_premul[None, :, None], (n_loc, 4, npx)))
    clips = jnp.ones((D, n_loc, npx), jnp.float32)
    calphas = jnp.ones((D,), jnp.float32)
    op_tab = plan_dyn["op_tab"]
    op_alpha = plan_dyn["op_alpha"]
    tpath_s, g_s = fr["tpath_s"], fr["g_s"]
    src_s, alpha_s, cov_s = fr["src_s"], fr["alpha_s"], fr["coverage_s"]

    from ..ops.pallas_kernels import (FINE_CHUNK, fine_composite_over,
                                      use_pallas)
    pallas_walk = use_pallas()
    if pallas_walk:
        # OP-PARTITIONED composite stream. Draws ranges partition path
        # space in draw order, so each fragment belongs to exactly one
        # draws op: slot(path) = #(draws_los <= path) - 1. A stable
        # re-sort by slot*(G+1)+tile groups every op's fragments into one
        # contiguous, tile-ordered run (path order preserved within a
        # tile by stability), so each draws op's Pallas walk streams ONLY
        # its own fragments — total composite chunk traffic is O(F). The
        # earlier per-op clipped bounds on the (tile, path)-sorted stream
        # still spanned the WHOLE stream per op (each step's [lo, hi)
        # union covers other ops' interleaved rows): measured 8.4 ms/op
        # regardless of block size. Gap fragments (push clip paths sit
        # between ranges) land in the previous slot but OUTSIDE its
        # [lo, hi) path window -> sorted past the op's hi boundary?
        # No: the boundary rank is (slot, tile)-granular, so gap
        # fragments ARE walked — they composite src=0 (zeroed at paint):
        # exact no-ops, like clip rows inside ranges.
        from ..ops.segmented import lookup_sorted, rank_sorted
        with jax.named_scope("s19_rank_bounds"):
            P = int(bufs["paint_pack"].shape[0])
            skey = g_s * (P + 1) + tpath_s
            ga = jnp.arange(n_loc, dtype=jnp.int32)
            nd = plan_dyn["draws_los"].shape[0]
            # side='right' - 1: count(draws_los <= path) - 1
            d_f = rank_sorted(plan_dyn["draws_los"], tpath_s + 1) - 1
            d_f = jnp.clip(d_f, 0, nd - 1)
            key2 = d_f * jnp.int32(n_loc + 1) + g_s
            F = key2.shape[0]
            key2_s, perm = jax.lax.sort(
                (key2, jnp.arange(F, dtype=jnp.int32)), num_keys=1,
                is_stable=True)   # stable: keeps path order within a tile
            src2 = src_s[perm]    # one F-row gather (~4 KB rows)
            fpad = (-F) % FINE_CHUNK
            if fpad:
                src2 = jnp.concatenate(
                    [src2, jnp.zeros((fpad,) + src2.shape[1:],
                                     src2.dtype)])
            # per-(draws slot, tile) walk bounds in the partitioned order:
            # [rank(o, g), rank(o, g + 1)). The g + 1 query lands BEFORE
            # slot o's dump-key rows (key2 = o*(n_loc+1) + n_loc), which
            # under stripe sharding carry other stripes' REAL coverage —
            # they must stay outside every walk.
            q2 = (jnp.arange(nd, dtype=jnp.int32)[:, None]
                  * jnp.int32(n_loc + 1) + ga[None, :]).reshape(-1)
            w2 = rank_sorted(key2_s, jnp.concatenate([q2, q2 + 1]))
            wlo = w2[:nd * n_loc].reshape(nd, n_loc)
            whi = w2[nd * n_loc:].reshape(nd, n_loc)
            # per-push clip coverage: the (tile, clip path) fragment is
            # unique, so an O(G) row lookup replaces the O(F) masked
            # segment sum (original (tile, path) order)
            nb = op_tab.shape[0]
            cq = jnp.where(op_tab[:, 5:6] >= 0,
                           ga[None, :] * (P + 1) + op_tab[:, 5:6], -1)
            cidx, cfound = lookup_sorted(skey, cq.reshape(-1))
            cidx = cidx.reshape(nb, n_loc)
            cfound = cfound.reshape(nb, n_loc)

    def op_draws(i, stack, clips, calphas, sp, di):
        with jax.named_scope("s20_op_draws"):
            if pallas_walk:
                top = fine_composite_over(src2, stack[sp],
                                          (wlo[di], whi[di]), n_loc)
                return stack.at[sp].set(top), clips, calphas, sp, di + 1
            lo, hi = op_tab[i, 3], op_tab[i, 4]
            m = (tpath_s >= lo) & (tpath_s < hi)
            alpha = jnp.where(m[:, None], alpha_s, 0.0)
            src = jnp.where(m[:, None, None], src_s, 0.0)
            top = fine_xla.composite_srcover_over(src, alpha, g_s,
                                                  stack[sp])
            return stack.at[sp].set(top), clips, calphas, sp, di + 1

    def op_push(i, stack, clips, calphas, sp, di):
        with jax.named_scope("s21_op_push"):
            cix = op_tab[i, 5]
            if pallas_walk:
                ccov = jnp.where(cfound[i][:, None],
                                 cov_s[cidx[i]], 0.0).astype(jnp.float32)
            else:
                sel = tpath_s == cix
                covs = jnp.where(sel[:, None], cov_s, 0.0)
                ccov = segment_sum_sorted(covs, g_s, n_loc)
            ccov = jnp.where(cix >= 0, ccov, 1.0)
            sp = sp + 1
            return (stack.at[sp].set(0.0), clips.at[sp].set(ccov),
                    calphas.at[sp].set(op_alpha[i]), sp, di)

    def op_pop(i, stack, clips, calphas, sp, di):
        scope = jax.named_scope("s22_op_pop")
        scope.__enter__()
        mix = op_tab[i, 1]
        compose = op_tab[i, 2]
        top = stack[sp]
        if key.has_filter:
            # layer filter with DYNAMIC params (kind+values are op-table
            # data): tiles -> image -> lax.switch(filter) -> tiles. Filters
            # are cross-tile, hence the whole-buffer reshape.
            from ..ops.filters import apply_filter_dyn
            WT = static.width_tiles
            ht = n_loc // WT
            frow = plan_dyn["op_filter"][i]
            im = top.reshape(ht, WT, 4, TILE_H, TILE_W)
            im = im.transpose(0, 3, 1, 4, 2).reshape(
                ht * TILE_H, WT * TILE_W, 4)
            im = apply_filter_dyn(jnp, jax.lax, im,
                                  frow[0].astype(jnp.int32), frow[1:])
            top = im.reshape(ht, TILE_H, WT, TILE_W, 4).transpose(
                0, 2, 4, 1, 3).reshape(n_loc, 4, npx)
        parent = stack[sp - 1]
        c = clips[sp][:, None, :]
        alpha = calphas[sp]
        ch_last = lambda x: x.transpose(0, 2, 1)

        # Only the SELECTED pop kind runs (lax.switch): computing the
        # luminance / alpha-mask / mix-compose results unconditionally and
        # where-selecting cost 3 whole-frame passes per pop (~2.6 ms/pop
        # of the 24-pop layered bench frame).
        def pop_normal(parent, top, c, alpha, mix, compose):
            blended = ch_last(blend_ops.blend_mix_compose_dyn(
                ch_last(parent), ch_last(top * alpha),
                jnp.where(mix == 128, 0, mix), compose))
            return parent * (1.0 - c) + blended * c

        def pop_lum(parent, top, c, alpha, mix, compose):
            fg = top * c * alpha
            lum = ch_last(blend_ops.luminance_mask(
                jnp, ch_last(parent), ch_last(fg)))
            return jnp.where(c > 0.0, lum, parent)

        def pop_amask(parent, top, c, alpha, mix, compose):
            fg = top * c * alpha
            amask = parent * jnp.clip(fg[:, 3:4, :], 0.0, 1.0)
            return jnp.where(c > 0.0, amask, parent)

        def pop_discard(parent, top, c, alpha, mix, compose):
            return parent

        cat = jnp.where(mix < 0, 3,
                        jnp.where(mix == 127, 1,
                                  jnp.where(mix == 126, 2, 0)))
        res = jax.lax.switch(
            cat, [pop_normal, pop_lum, pop_amask, pop_discard],
            parent, top, c, alpha, mix, compose)
        out = stack.at[sp - 1].set(res), clips, calphas, sp - 1, di
        scope.__exit__(None, None, None)
        return out

    def op_nop(i, stack, clips, calphas, sp, di):
        return stack, clips, calphas, sp, di

    def body(i, state):
        stack, clips, calphas, sp, di = state
        kind = jnp.clip(op_tab[i, 0], 0, 3)
        return jax.lax.switch(kind, [op_draws, op_push, op_pop, op_nop],
                              i, stack, clips, calphas, sp, di)

    stack, _, _, _, _ = jax.lax.fori_loop(
        0, op_tab.shape[0], body,
        (stack, clips, calphas, jnp.int32(0), jnp.int32(0)))
    tiles = stack[0]
    img = _tiles_to_image(tiles, static, fr["ht_local"], stripe is None)
    return img, fr["overflow"]


def render_frame_layered(bufs: dict, plan_dyn: dict, static: PipelineStatic,
                         plan: LayerPlanStatic, stripe=None):
    fr = prepare_fragments(bufs, static, stripe, keep_clip_paths=True)
    n_loc = fr["n_loc"]
    npx = TILE_H * TILE_W
    base = bufs["base_color"]
    base_premul = jnp.concatenate([base[:3] * base[3], base[3:4]])
    bottom = jnp.broadcast_to(base_premul[None, :, None], (n_loc, 4, npx))

    if plan.n_clip_levels:
        _apply_clip_chains(fr, plan_dyn, plan.n_clip_levels)

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
            if mix in (126, 127):  # ALPHA_MASK / LUMINANCE_MASK
                fg = top * c * alpha
                mfun = blend_ops.luminance_mask if mix == 127 \
                    else blend_ops.alpha_mask
                masked = mfun(
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


def get_layered_pipeline(static: PipelineStatic, plan: LayerPlanStatic,
                         scan_key: "LayerPlanScanKey" = None,
                         has_filter: bool = True):
    """Everything uses the plan-as-data scan pipeline whose compile key is
    only the bucketed (n_ops, depth, clip levels, has_filter) — filters are
    dynamic-parameter ops in the table since round 3, so filtered layer
    structures no longer force one compile per structure.
    VELLO_TPU_UNROLLED_LAYERS=1 selects the unrolled fallback."""
    import os as _os
    if scan_key is not None \
            and not _os.environ.get("VELLO_TPU_UNROLLED_LAYERS"):
        key = (static, scan_key)
        if key not in _JIT_CACHE:
            _JIT_CACHE[key] = jax.jit(
                partial(render_frame_layered_scan, static=static,
                        key=scan_key))
        return _JIT_CACHE[key]
    key = (static, plan)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            partial(render_frame_layered, static=static, plan=plan))
    return _JIT_CACHE[key]
