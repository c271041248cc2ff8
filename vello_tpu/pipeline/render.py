"""The jitted end-to-end render pipeline (single frame, single device).

One XLA program per (capacity tier, viewport, paint-kind set) replaces the
reference's ~18-dispatch recording + WgpuEngine (``vello/src/render.rs:135-557``,
``wgpu_engine.rs``): XLA owns scheduling, fusion, and buffers; overflow flags
replace ``BumpAllocators.failed`` and drive the host-side retry-at-next-tier
loop (the reference's robust-memory protocol, ``vello/src/lib.rs:717-783``).

Stage order (TPU formulation of the classic pipeline, SURVEY.md §2.2):
  pathtag cumsum-scan -> decode -> flatten(+viewport clip) -> tile alloc
  (host hull rects + cumsum) -> touch expansion (DDA closed form) ->
  backdrop sort+segmented-sum + row prefix -> touch sort -> per-fragment
  winding -> fill rule -> paint -> (gtile, order) sort -> transmittance
  composite. No scatter ops anywhere (TPU scatter serializes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..encoding.config import Capacities, TILE_H, TILE_W
from ..ops import fine_xla, flatten as flatten_ops, pathtag, tiling
from ..ops import segmented
from ..ops.segmented import segment_sum_sorted


@dataclass(frozen=True)
class PipelineStatic:
    caps_key: Tuple[int, ...]
    width: int
    height: int
    kinds_present: Tuple[int, ...]
    aa: str = "area"  # "area" | "centers" (binary per-sample, used by msaa)
    n_live: int = 0   # live-fragment cap after culling (0 = no culling)
    has_evenodd: bool = True  # any even-odd fill rule in the scene (static
                              # specialization of the msaa resolve)
    lowp: bool = False        # bf16 fine tensors (OptimizeSpeed analog)
    has_edge: bool = True     # any geometry may cross the left viewport
                              # boundary: False statically skips the
                              # edge-vertical expansion (two L-scale sorts);
                              # guarded by overflow bit 32 + retry
    has_stroke: bool = False  # any device-expanded stroke styles: enables
                              # the flatten stroke branch (quad+bevel
                              # emission per centerline mini)
    max_lines: int = 64       # per-segment flatten subdivision cap
                              # (MAX_LINES_PER_SEG), RAISED by the resolver
                              # when the estimator detects pathological
                              # segments whose Wang count exceeds it — so
                              # huge single curves keep the 0.25 px
                              # tolerance instead of silently coarsening

    @property
    def width_tiles(self):
        return (self.width + TILE_W - 1) // TILE_W

    @property
    def height_tiles(self):
        return (self.height + TILE_H - 1) // TILE_H


def _msaa_coverage_device(trow, seg_ids, starts, backdrop, rule, valid,
                          ns, has_evenodd=True):
    """Fused sample-mask MSAA coverage on TPU.

    Fragments get DENSE ranks (cumsum of run starts in the sorted touch
    stream) so the kernel's fragment window stays bounded; backdrop/rule
    compact to rank order with one small F-sort; untouched fragments
    (backdrop-only interiors) resolve to fill(backdrop) outside the kernel.

    Returns (out_t, ends, has_t, cov_empty): the per-last-touch coverage
    rows plus the lookup data to assemble any fragment's coverage with ONE
    row gather — callers compose this with their own fragment permutation
    instead of materializing (F, 256) twice (each (F, 256) row gather is
    ~2.5 ms at the bench tier)."""
    from ..ops.pallas_kernels import WF_M, msaa_coverage_pallas

    f = backdrop.shape[0]
    has_t = starts[1:] > starts[:-1]
    rank_f = jnp.cumsum(has_t.astype(jnp.int32)) - 1
    key = jnp.where(has_t, rank_f, jnp.int32(2 ** 30))
    _, bd_d, rl_d = jax.lax.sort(
        (key, backdrop, rule[:, 0].astype(jnp.float32)), num_keys=1)
    fpad = f + 8 + WF_M
    bdr = jnp.pad(jnp.stack([bd_d, rl_d], axis=-1),
                  ((0, fpad - f), (0, 126)))             # (Fpad, 128)
    # ranks/boundaries derive in-kernel from the ftile payload column
    # (trow col 6) — no (T, 8) rank/is_last concat is materialized.
    # out_t is BLOCK-REGION indexed (round 5): block g's resolved window
    # occupies rows [g*WF, (g+1)*WF) (statically aligned DMA — Mosaic
    # can't prove data-dependent rank offsets divisible by the tiling),
    # and fragment f's final coverage lives in its CLOSING block's
    # region at b_last*WF + rank - w0(b_last). One gather either way;
    # this deletes the old per-block back-map one-hot matmul.
    out_t, w0_b = msaa_coverage_pallas(trow, bdr, ns,
                                       has_evenodd=has_evenodd, ft_clip=f)
    rank_c = jnp.maximum(rank_f, 0)
    from ..ops.pallas_kernels import CK_M
    t_last = jnp.maximum(starts[1:] - 1, 0)              # (F,)
    b_last = t_last // CK_M                              # (F,)
    # Expand the (G,) per-block window bases to (F,) WITHOUT an F-scale
    # row gather (~8 ns/row = 1.5 ms at the bench tier — lesson 5):
    # b_last is nondecreasing (t_last increases with f), so w0_b[b_last]
    # is piecewise-constant — a G-scale boundary scatter of telescoping
    # deltas + one F-scale cumsum reproduces it.
    gsz = w0_b.shape[0]
    from ..ops.segmented import searchsorted_dense
    fb_lo = searchsorted_dense(b_last, gsz, side="left")  # (G,)
    delta = jnp.diff(w0_b, prepend=jnp.zeros(1, w0_b.dtype))
    w0_exp = jnp.cumsum(jnp.zeros(f + 1, w0_b.dtype)
                        .at[fb_lo].add(delta))[:f]       # (F,)
    grow = (b_last * WF_M + rank_c - w0_exp).astype(jnp.float32)
    cov_empty = fine_xla.apply_fill_rule(backdrop[:, None], rule)
    # One packed (F, 2) table (a narrower row gather costs the same, but
    # every (F, k<128) column materialized pays 128/k lane-pad bloat, so
    # the three flags ride ONE arithmetic-packed f32: row*4 + has_t*2 +
    # valid stays exact below 2^24 tiers).
    flags = (grow * 4.0
             + has_t.astype(jnp.float32) * 2.0 + valid.astype(jnp.float32))
    pack = jnp.stack([flags, cov_empty[:, 0]], axis=-1)  # (F, 2)
    return out_t, pack


def _msaa_pack_has_t(pack):
    """Decode the has-touches bit from the packed flags column."""
    return jnp.floor_divide(pack[:, 0], 2.0) % 2.0 > 0.0


def _msaa_coverage_at(parts, fidx):
    """Assemble coverage rows for fragments fidx from _msaa_coverage_device
    parts with one (N, 2) pack gather + one (N, 256) row gather."""
    out_t, pack = parts
    # row-pair-packed gather (see bdpack): dodge the >=2^18-row f32 cliff
    p4 = pack.reshape(-1, 4)
    gp = p4[fidx // 2]
    pr = jnp.where((fidx % 2 == 1)[:, None], gp[:, 2:4], gp[:, 0:2])
    flags = pr[:, 0:1]
    ends = jnp.floor_divide(flags, 4.0)
    has_t = jnp.floor_divide(flags, 2.0) % 2.0
    valid = flags % 2.0
    # out_t rows are bf16 (exact k/ns coverage); keep the assembled rows
    # bf16 so downstream composite reads move half the bytes
    cov = jnp.where(has_t > 0.0,
                    out_t[ends[:, 0].astype(jnp.int32)],
                    pr[:, 1:2].astype(out_t.dtype))
    return jnp.where(valid > 0.0, cov, jnp.zeros((), out_t.dtype))


def wants_fused_geom(caps: "Capacities") -> bool:
    """True when the fused Pallas geometry path will be traced for this
    tier (single-device, no geometry sharding). The renderer mirrors this
    to upload ONLY the buffers that path reads — the tag/data streams and
    split paint tables exist for the XLA fallback and cost ~20 MB of
    tunnel upload per scene otherwise."""
    import os as _os

    from ..ops.pallas_kernels import BLK_F, BLK_X, use_pallas
    return (use_pallas() and caps.n_lines % BLK_F == 0
            and caps.n_touches % BLK_X == 0
            and not _os.environ.get("VELLO_TPU_NO_FUSED_GEOM"))


def prepare_fragments(bufs: dict, static: PipelineStatic, stripe=None,
                      keep_clip_paths: bool = False, want_src: bool = True,
                      geom_axis=None, geom_shards: int = 1):
    """Run geometry + fine stages; return sorted per-fragment data.

    Fragments = (path, touched-tile) pairs (the reference's Tile records),
    sorted by (local gtile, draw order). keep_clip_paths keeps clip-shape
    fragments' coverage (the layered compositor needs it); their paint alpha
    is zeroed so they never draw directly.

    geom_axis: when running under shard_map, the mesh axis name to shard the
    GEOMETRY stages over: each member flattens/tiles only its slice of the
    segment stream, and the partial per-fragment coverage + backdrop sums
    (which are additive) are combined with one psum — the geometry work
    scales with the axis instead of being replicated.
    """
    caps = Capacities(*static.caps_key)
    # msaa + geometry sharding: the per-SAMPLE tensor is never exchanged.
    # Tag slices snap to PATH boundaries, so every fragment's touches (and
    # its backdrop deltas) live on exactly ONE shard — the non-owning
    # shards resolve that fragment's msaa coverage to 0 (no touches, zero
    # backdrop), and one (n_live, 256) psum of the POST-fill-rule coverage
    # combines the shards exactly (owning-shard-complete sums, not
    # partial-winding sums).
    H = float(static.height)
    WT, HT = static.width_tiles, static.height_tiles
    # One extra tile column so the x-clamp boundary (which deforms crossing
    # geometry) sits outside the visible area.
    WT_alloc = WT + 1
    W = float(WT_alloc * TILE_W)

    with jax.named_scope("s01_tile_alloc"):
        rects = tiling.tile_alloc(bufs["path_rect"], WT_alloc, HT)
    overflow_tiles = (rects["total_tiles"] > caps.n_path_tiles
                      ).astype(jnp.int32)
    n_edge = caps.n_edges

    import os as _os

    from ..ops.pallas_kernels import BLK_F, BLK_X, use_pallas
    fused_geom = (use_pallas() and geom_axis is None
                  and "seg_pts" in bufs
                  and caps.n_lines % BLK_F == 0
                  and caps.n_touches % BLK_X == 0
                  and not _os.environ.get("VELLO_TPU_NO_FUSED_GEOM"))
    if fused_geom:
        # Fused Pallas geometry: host-compacted segments -> line pack ->
        # touches, no expansion sorts and no per-element row gathers.
        with jax.named_scope("s02_flatten"):
            ff = flatten_ops.flatten_fused(
                bufs["seg_pts"], bufs["seg_kind"],
                bufs["seg_path"], bufs["n_segs"], caps.n_lines, W, H,
                tiling.rect_pack(rects),
                seg_hw=bufs.get("seg_hw") if static.has_stroke else None,
                seg_join=bufs.get("seg_join")
                if static.has_stroke else None,
                max_lines=static.max_lines)
        with jax.named_scope("s03_touch_expand"):
            touches = tiling.make_touches_from_linepack(
                ff["linepack"], ff["total_lines"], caps.n_touches, n_edge,
                has_edge=static.has_edge)
        geom_overflow = ff["overflow"] + 2 * touches["overflow_edges"]
    else:
        decoded = pathtag.decode_and_transform(
            bufs["tags"], bufs["data"], bufs["transforms"], bufs["styles"],
            data4=bufs.get("data4"),
            style_hw=bufs.get("style_hw") if static.has_stroke else None)

        nl_local, nt_local, ne_local = caps.n_lines, caps.n_touches, n_edge
        if geom_axis is not None:
            # Slice the per-tag-slot arrays to this member's segment shard
            # (the tag scan itself is global and cheap; padding is inert),
            # AND shrink the line/touch capacities by the shard count so
            # per-chip geometry work actually scales 1/n (a shard holding
            # more than its slice's share trips the overflow retry).
            k = jax.lax.axis_index(geom_axis)
            # Real content concentrates in the first (unpadded) tag slots;
            # static even slicing would overload shard 0. Shards take
            # ceil(real/shards)-sized spans.
            n_real = bufs.get("n_tags_real",
                              jnp.int32(caps.n_tags)).astype(jnp.int32)
            share = (n_real + geom_shards - 1) // geom_shards
            msaa_mode = static.aa in ("msaa8", "msaa16")
            if msaa_mode:
                # msaa needs PATH-ALIGNED ownership (each fragment's
                # touches + backdrop on exactly one shard): snap the span
                # bounds UP to path boundaries and mask on the FULL tag
                # window — tag/segment-scale ops are cheap and stay
                # replicated, while the expensive line/touch stages below
                # still run at 1/n capacity. (A windowed slice would cut
                # paths larger than the window.)
                lo_i = k * share
                hi_i = jnp.minimum((k + 1) * share, n_real)
                ptb = bufs.get("path_tag_bounds")
                if ptb is not None:
                    pmax = ptb.shape[0] - 1
                    lo_i = ptb[jnp.minimum(
                        jnp.searchsorted(ptb, lo_i, side="left"), pmax)]
                    hi_i = ptb[jnp.minimum(
                        jnp.searchsorted(ptb, hi_i, side="left"), pmax)]
                gidx = jnp.arange(caps.n_tags, dtype=jnp.int32)
                active = (gidx >= lo_i) & (gidx < hi_i)
                decoded["kind"] = jnp.where(active, decoded["kind"], 0)
            else:
                chunk = caps.n_tags // geom_shards
                start = jnp.minimum(k * share,
                                    jnp.int32(caps.n_tags - chunk))
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start,
                                                            chunk, 0)
                decoded = {key: sl(v) for key, v in decoded.items()}
                gidx = start + jnp.arange(chunk, dtype=jnp.int32)
                active = (gidx >= k * share) & (gidx < (k + 1) * share)
                decoded["kind"] = jnp.where(active, decoded["kind"], 0)
            nl_local = max(caps.n_lines // geom_shards, 1024)
            # keep the per-shard touch capacity BLK-aligned for the
            # coverage kernel (the global cap's 15360 alignment does not
            # survive division by the shard count)
            nt_local = -(-max(caps.n_touches // geom_shards, 1024)
                         // 1024) * 1024
            ne_local = max(caps.n_edges // geom_shards, 256)

        fl = flatten_ops.flatten(decoded, nl_local, ne_local, W, H,
                                 rpack=tiling.rect_pack(rects),
                                 has_stroke=static.has_stroke,
                                 max_lines=static.max_lines)
        # Edges FIRST and marked always-producing: the fused expansion's
        # window invariant needs every slot before the last producer to
        # emit >= 1 touch (dead edge slots emit a dump dummy); the mid
        # region is a dense prefix, so only trailing padding is silent.
        ones_e = jnp.ones(fl["edge_lines"].shape[0], bool)
        lines = jnp.concatenate([fl["edge_lines"], fl["lines"]], axis=0)
        lpath = jnp.concatenate([fl["edge_path"], fl["line_path"]], axis=0)
        lrect = jnp.concatenate([fl["edge_rect"], fl["line_rect"]], axis=0)
        lreal = jnp.concatenate([ones_e, fl["line_real"]], axis=0)
        touches = tiling.make_touches(lines, lpath, rects, nt_local,
                                      line_rect=lrect, line_real=lreal)
        geom_overflow = fl["overflow"]

    # --- sort touches by flat tile (the "coarse" sort) ---
    # Sort only (key, index) — every payload operand rides ALL ~18 merge
    # passes of the sort network, while a packed ROW gather fetches the 6
    # per-touch fields in one pass afterwards (device trace: the 7-operand
    # sort was 8.3 ms/frame; 2-operand sort + row gather is ~3.5 ms).
    if "pay" in touches:
        tpack = touches["pay"].T                              # (T, 8)
    else:
        # col 6 = ftile: the msaa kernel derives fragment ranks/boundaries
        # from this column post-sort (no separate rank/is_last concat)
        tpack = jnp.concatenate(
            [touches["seg"], touches["y_edge"][:, None],
             touches["backdrop_val"][:, None],
             touches["ftile"].astype(jnp.float32)[:, None],
             jnp.zeros((touches["seg"].shape[0], 1), jnp.float32)],
            axis=-1)                                          # (T, 8)
    tix = jnp.arange(tpack.shape[0], dtype=jnp.int32)
    with jax.named_scope("s04_coarse_sort"):
        # unstable: touch order within a tile is immaterial (winding sums
        # and boundary masks commute), and stability costs a hidden iota
        # channel through every merge pass
        ftile_s, tix_s = jax.lax.sort((touches["ftile"], tix), num_keys=1,
                                      is_stable=False)
        trow = tpack[tix_s]
    seg_s = trow[:, :4]
    yedge_s = trow[:, 4]
    bdval_s = trow[:, 5]
    seg_ids = jnp.clip(ftile_s, 0, caps.n_path_tiles)
    # One searchsorted + one gather serve both coverage and the
    # backdrop-delta channel (deltas target ftile+1 => roll by one tile).
    from ..ops.pallas_kernels import coverage_cumsum_pallas, use_pallas
    from ..ops.segmented import segment_starts, segment_sum_from_starts
    with jax.named_scope("s05_segment_starts"):
        starts = segment_starts(seg_ids, caps.n_path_tiles)
    bd_sum = segment_sum_from_starts(bdval_s, starts)
    if geom_axis is not None and static.aa not in ("msaa8", "msaa16"):
        # Backdrop deltas are additive across segment shards (area path).
        # msaa must NOT psum here: its cross-shard combination sums the
        # POST-fill-rule coverage, which is only exact when non-owning
        # shards see zero backdrop (fill(0) = 0) — path-aligned slicing
        # keeps each path's deltas complete on its owning shard.
        bd_sum = jax.lax.psum(bd_sum, axis_name=geom_axis)
    bd_delta = jnp.concatenate([jnp.zeros(1, jnp.float32), bd_sum[:-1]])

    # --- per flat tile metadata ---
    # TPU row gathers cost ~10ns/ROW regardless of width, so the six
    # per-path lookups ride ONE packed row gather instead of six.
    t = jnp.arange(caps.n_path_tiles, dtype=jnp.int32)
    incl = rects["base"] + rects["areas"]
    tpath = segmented.searchsorted_dense(
        incl, caps.n_path_tiles, side="right")
    tpath = jnp.clip(tpath, 0, caps.n_paths - 1)
    tmeta = jnp.stack([bufs["path_kind"], rects["stride"], rects["base"],
                       rects["tx0"], rects["ty0"], bufs["fill_rule"]],
                      axis=-1)                            # (P, 6) i32
    tmrow = tmeta[tpath]                                  # (F, 6)
    is_clip = tmrow[:, 0] != 0
    tvalid = t < rects["total_tiles"]
    if not keep_clip_paths:
        tvalid = tvalid & ~is_clip
    stride = jnp.maximum(tmrow[:, 1], 1)
    rel = t - tmrow[:, 2]
    tx = tmrow[:, 3] + rel % stride
    ty = tmrow[:, 4] + rel // stride

    # Backdrop = inclusive prefix of the deltas along each tile row
    # (backdrop_dyn.wgsl replacement, sharing this stage's tpath/rel).
    row_start = tmrow[:, 2] + (rel // stride) * stride
    cbd = jnp.cumsum(bd_delta)
    # Row-pair-packed gather: an f32 (F, 2) source at F >= 2^18 rows hits
    # the slow gather path (~11 ns/row vs 2.9 packed) — gather (F/2, 4)
    # rows at row_start//2 and select the half (caps are 1024-aligned).
    bp4 = jnp.stack([cbd, bd_delta], axis=-1).reshape(-1, 4)
    gp = bp4[row_start // 2]
    odd = (row_start % 2 == 1)[:, None]
    bdpack = jnp.where(odd, gp[:, 2:4], gp[:, 0:2])
    backdrop = cbd - bdpack[:, 0] + bdpack[:, 1]
    rule = tmrow[:, 5][:, None]

    cov_scope = jax.named_scope("s06_coverage")
    cov_scope.__enter__()
    if static.aa in ("msaa8", "msaa16"):
        # Sample-mask MSAA: per-sample winding, fill rule per sample, box
        # resolve (fine.wgsl fill_path_ms role).
        ns = 8 if static.aa == "msaa8" else 16
        bdf = backdrop.astype(jnp.float32)
        if use_pallas():
            # Deferred assembly: keep (out_t, ends, has_t, cov_empty) and
            # gather coverage rows once, post-fragment-sort.
            msaa_parts = _msaa_coverage_device(trow, seg_ids, starts, bdf,
                                               rule, tvalid, ns,
                                               static.has_evenodd)
            coverage = None
        else:
            coverage = fine_xla.msaa_coverage_xla(seg_s, yedge_s, starts,
                                                  bdf, rule, ns)
            if geom_axis is not None:
                # path-aligned slicing: per-fragment coverage is complete
                # on the owning shard and exactly 0 elsewhere (no touches,
                # zero backdrop), so a post-fill-rule sum is exact
                coverage = jax.lax.psum(coverage, axis_name=geom_axis)
    else:
        if use_pallas():
            # Fused Pallas kernel: winding coverage + running cumsum in
            # VMEM. Gather csum[starts-1] with start==0 masked instead of
            # physically prepending a zero row (the concat copies the
            # whole 268 MB tensor).
            csum = coverage_cumsum_pallas(seg_s, yedge_s)
            at = jnp.where((starts > 0)[:, None],
                           csum[jnp.maximum(starts - 1, 0)], 0.0)
            frag_cov = at[1:] - at[:-1]                  # (F, 256)
        else:
            cov = fine_xla.coverage_delta(seg_s, yedge_s)
            frag_cov = segment_sum_from_starts(cov, starts)
        if geom_axis is not None:
            # Coverage is additive across segment shards: one all-reduce
            # combines the partial geometry of all members.
            frag_cov = jax.lax.psum(frag_cov, axis_name=geom_axis)
        winding = backdrop[:, None].astype(jnp.float32) + frag_cov
        coverage = fine_xla.apply_fill_rule(winding, rule)
        if static.aa == "centers":
            # binary sample coverage: threshold at half coverage ~=
            # center-in-shape for straight edges (supersampling helper)
            coverage = jnp.where(coverage >= 0.5, 1.0, 0.0)
    if coverage is not None:
        coverage = jnp.where(tvalid[:, None], coverage, 0.0)
    cov_scope.__exit__(None, None, None)

    # --- cull + sort fragments by (local gtile, draw order) ---
    # Fragments with zero coverage everywhere (bbox tiles the shape never
    # reaches) paint and composite as no-ops; route them to the dump key so
    # the sort pushes them past the live-fragment cap and every downstream
    # stage runs at n_live instead of the full bbox-tile capacity.
    if stripe is None:
        ty_lo, ht_local = 0, HT
    else:
        ty_lo, ht_local = stripe
    n_loc = WT * ht_local
    owned = tvalid & (tx < WT) & (ty >= ty_lo) & (ty < ty_lo + ht_local)
    overflow_live = jnp.int32(0)
    if static.n_live:
        if coverage is None:
            # Deferred msaa: a fragment can only cover pixels if it has
            # touches or a visible backdrop. Keeping the rare
            # all-cancelling fragment live costs a no-op composite;
            # dropping the (F, 256) materialization saves a row gather.
            _, pack_m = msaa_parts
            live = _msaa_pack_has_t(pack_m) | (pack_m[:, 1] > (1.0 / 512.0))
            if geom_axis is not None:
                # the live mask keys the fragment sort, which must be
                # IDENTICAL on every shard for the coverage psum to align:
                # a fragment is live if live on ANY shard (its owner)
                live = jax.lax.psum(live.astype(jnp.int32),
                                    axis_name=geom_axis) > 0
        else:
            live = jnp.max(coverage, axis=1) > (1.0 / 512.0)
        owned = owned & live
        n_live_actual = jnp.sum(owned.astype(jnp.int32))
        overflow_live = 16 * (n_live_actual > static.n_live).astype(jnp.int32)
    gtile = jnp.where(owned, (ty - ty_lo) * WT + tx, n_loc)
    with jax.named_scope("s07_fragment_sort"):
        # unstable: (gtile, tpath) pairs are unique (one fragment per
        # (path, tile)), so the 2-key sort needs no tiebreaker
        g_s, tpath_s, fidx_s = jax.lax.sort((gtile, tpath, t), num_keys=2,
                                            is_stable=False)
    if static.n_live:
        g_s = g_s[:static.n_live]
        tpath_s = tpath_s[:static.n_live]
        fidx_s = fidx_s[:static.n_live]
    with jax.named_scope("s08_coverage_assembly"):
        if coverage is None:
            coverage_s = _msaa_coverage_at(msaa_parts, fidx_s)
            if geom_axis is not None:
                # owning-shard-complete msaa coverage: one post-assembly
                # all-reduce at n_live rows combines the shards exactly
                coverage_s = jax.lax.psum(coverage_s, axis_name=geom_axis)
            if keep_clip_paths:
                # the layered compositor multiplies coverages (clip-chain
                # collapse); bf16 k/ns values are exact but their products
                # are not — widen for the layered path
                coverage_s = coverage_s.astype(jnp.float32)
        else:
            coverage_s = coverage[fidx_s]  # 1 KB rows, 4x cheaper than src
    overflow = geom_overflow + 4 * touches["overflow"] \
        + 8 * overflow_tiles + overflow_live
    out = {
        "g_s": g_s,                    # sorted local gtile per fragment
        "tpath_s": tpath_s,            # owning path (draw order key)
        "n_loc": n_loc,
        "ht_local": ht_local,
        "WT": WT,
        "overflow": overflow,
        "coverage_s": coverage_s,
    }
    if static.lowp:
        # lowp: coverage rows carry 8 mantissa bits — at or above the
        # precision of the u8 output target (fine/lowp.rs role)
        coverage_s = coverage_s.astype(jnp.bfloat16)
    if want_src:
        solid_only = not any(k in static.kinds_present for k in (1, 2, 3))
        if solid_only and not keep_clip_paths and use_pallas():
            # (also under stripes since round 3: g_s is stripe-local, so
            # the Pallas composite walks local tiles directly)
            # Solid fast path: the composite kernel forms color x coverage
            # rows in VMEM — no (F, 4, NPX) src tensor (805 MB at the
            # bench tier) is ever materialized.
            col = bufs["paint_pack"][tpath_s][:, 1:5]            # (F, 4)
            out["col_s"] = col.astype(jnp.bfloat16) if static.lowp else col
            return out
        # Paint evaluated in SORTED order (post-sort): only scalar metadata
        # rides the permutation, never a (F, 4, NPX) tensor — and all the
        # per-path paint fields ride ONE packed row gather (row count, not
        # width, is what a TPU gather costs).
        txy_s = jnp.stack([tx, ty], axis=-1)[fidx_s]     # (F, 2)
        prow = bufs["paint_pack"][tpath_s]               # (F, 40)
        with jax.named_scope("s09_paint"):
            src_s = fine_xla.eval_paints(
                (txy_s[:, 0] * TILE_W).astype(jnp.float32),
                (txy_s[:, 1] * TILE_H).astype(jnp.float32),
                prow[:, 0].astype(jnp.int32), prow[:, 1:5],
                prow[:, 5:17], prow[:, 17:23],
                prow[:, 23:31], prow[:, 31:39],
                bufs["ramps"], bufs["atlas"],
                frozenset(static.kinds_present))
            src_s = src_s * coverage_s[:, None, :]       # (F, 4, NPX)
        if keep_clip_paths:
            is_clip_s = prow[:, 39] != 0
            src_s = jnp.where(is_clip_s[:, None, None], 0.0, src_s)
        if static.lowp:
            src_s = src_s.astype(jnp.bfloat16)
        out["src_s"] = src_s           # premultiplied paint*coverage (F,4,P)
        out["alpha_s"] = src_s[:, 3, :]
        # opaque solid fragments drive occlusion culling downstream
        out["opaque_s"] = (prow[:, 0] == 0.0) & (prow[:, 4] >= 1.0 - 1e-6)
        if keep_clip_paths:
            out["opaque_s"] = out["opaque_s"] & ~is_clip_s
    return out


def _tiles_to_image(tiles, static, ht_local, crop_h: bool,
                    u8_out: bool = False):
    """(G, 4, NPX) channel-planar tiles -> (H, W, 4) image.

    ``u8_out``: quantize to straight-alpha RGBA8 while still channel-planar
    (lane-friendly 256-wide rows), THEN detile — the reference's render
    target is an rgba8 texture (render.rs render_to_texture), and the
    (G,4,NPX)->(H,W,4) relayout moves 4x fewer bytes in u8. Elementwise
    quantization commutes with the transpose, so the result is bit-identical
    to converting after assembly (utils.png.to_rgba8 semantics)."""
    WT = static.width_tiles
    # enforce the premultiplied invariant (0 <= rgb <= a <= 1); f32 rounding
    # in the transmittance composite can exceed it by ~1e-5
    a = jnp.clip(tiles[:, 3:4], 0.0, 1.0)
    rgb = jnp.clip(tiles[:, :3], 0.0, a)
    if u8_out:
        # zero rgb where alpha quantizes to u8 0: unpremultiplying by a
        # float-noise ~1e-5 alpha amplifies coverage residue into
        # backend-dependent rgb-at-alpha-0 artifacts (png.to_rgba8 rule)
        vis = a >= (1.0 / 510.0)
        safe = jnp.where(vis, a, 1.0)
        rgb = jnp.where(vis, jnp.clip(rgb / safe, 0.0, 1.0), 0.0)
        tiles = jnp.concatenate([rgb, a], axis=1)
        tiles = (tiles * 255.0 + 0.5).astype(jnp.uint8)
    else:
        tiles = jnp.concatenate([rgb, a], axis=1)
    img = tiles.reshape(ht_local, WT, 4, TILE_H, TILE_W)
    img = img.transpose(0, 3, 1, 4, 2).reshape(ht_local * TILE_H,
                                               WT * TILE_W, 4)
    if crop_h:
        img = img[:static.height, :static.width]
    else:
        img = img[:, :static.width]
    return img


def occlusion_los(g_s, coverage_s, opaque, n_loc, starts_g):
    """Advance each tile's composite-walk start to its LAST fragment that
    is opaque and fully covers the tile — everything below is invisible
    and never read (the DepthBuffer role of vello_cpu coarse/depth.rs).
    Returns (los, his)."""
    fcount = g_s.shape[0]
    full = jnp.min(coverage_s, axis=1) >= 1.0 - 1e-6
    cond = opaque & full & (g_s < n_loc)
    # global running last-cover index; a stale index from an EARLIER tile
    # is always < this tile's lo and clips to a no-op
    m = jax.lax.cummax(
        jnp.where(cond, jnp.arange(fcount, dtype=jnp.int32), -1))
    lo0, hi0 = starts_g[:-1], starts_g[1:]
    has = hi0 > lo0
    cover = m[jnp.maximum(hi0 - 1, 0)]
    los = jnp.where(has, jnp.clip(cover, lo0, hi0), lo0)
    return los, hi0


def render_frame(bufs: dict, static: PipelineStatic, stripe=None,
                 geom_axis=None, geom_shards: int = 1):
    """Fast path: src-over-only scene (no layers).

    Returns (image (H, W, 4) premultiplied f32, overflow flags i32).
    """
    from ..ops.pallas_kernels import (fine_composite_solid,
                                      fine_composite_solid_cov, use_pallas)
    base = bufs["base_color"]
    base_premul = jnp.concatenate([base[:3] * base[3], base[3:4]])
    fr = prepare_fragments(bufs, static, stripe, geom_axis=geom_axis,
                           geom_shards=geom_shards)
    if use_pallas():
        # Fused Pallas fine: per-tile sequential src-over in VMEM replaces
        # the XLA suffix-sum/exp/segmented-sum composite passes.
        starts_g = segmented.searchsorted_dense(
            fr["g_s"], fr["n_loc"] + 1, side="left")
        # Occlusion culling (DepthBuffer role, vello_cpu coarse/depth.rs):
        # advance each tile's walk to its LAST fully-covering opaque
        # fragment — everything below is invisible and never read.
        with jax.named_scope("s09b_occlusion"):
            if "col_s" in fr:
                opaque = fr["col_s"][:, 3] >= 1.0 - 1e-6
            else:
                opaque = fr["opaque_s"]
            los, hi0 = occlusion_los(fr["g_s"], fr["coverage_s"], opaque,
                                     fr["n_loc"], starts_g)
        with jax.named_scope("s10_composite"):
            if "col_s" in fr:
                tiles = fine_composite_solid_cov(
                    fr["coverage_s"], fr["col_s"], base_premul, (los, hi0),
                    fr["n_loc"])
            else:
                tiles = fine_composite_solid(fr["src_s"], base_premul,
                                             (los, hi0), fr["n_loc"])
    else:
        with jax.named_scope("s10_composite"):
            tiles = fine_xla.composite_srcover(fr["src_s"], fr["alpha_s"],
                                               fr["g_s"], fr["n_loc"],
                                               base_premul)
    img = _tiles_to_image(tiles, static, fr["ht_local"], stripe is None)
    return img, fr["overflow"]


def composite_frame(fr: dict, base_color, *, width: int, height: int,
                    lowp: bool, u8_out: bool = False):
    """Part B of the SPLIT pipeline: occlusion + fine composite + image
    assembly, from prepare_fragments' outputs. Compiled separately from the
    geometry program: XLA's optimization time explodes superlinearly in
    program size (measured: geometry alone 30 s + composite alone 4 s vs
    205 s combined at the mmark tier), and this half's compile key is only
    (fragment shapes, viewport, lowp) — shared across capacity variants."""
    from ..ops.pallas_kernels import (fine_composite_solid,
                                      fine_composite_solid_cov, use_pallas)
    WT = (width + TILE_W - 1) // TILE_W
    HT = (height + TILE_H - 1) // TILE_H
    n_loc = WT * HT
    base_premul = jnp.concatenate([base_color[:3] * base_color[3],
                                   base_color[3:4]])
    if use_pallas():
        starts_g = segmented.searchsorted_dense(
            fr["g_s"], n_loc + 1, side="left")
        with jax.named_scope("s09b_occlusion"):
            if "col_s" in fr:
                opaque = fr["col_s"][:, 3] >= 1.0 - 1e-6
            else:
                opaque = fr["opaque_s"]
            los, hi0 = occlusion_los(fr["g_s"], fr["coverage_s"], opaque,
                                     n_loc, starts_g)
        with jax.named_scope("s10_composite"):
            if "col_s" in fr:
                tiles = fine_composite_solid_cov(
                    fr["coverage_s"], fr["col_s"], base_premul, (los, hi0),
                    n_loc)
            else:
                tiles = fine_composite_solid(fr["src_s"], base_premul,
                                             (los, hi0), n_loc)
    else:
        with jax.named_scope("s10_composite"):
            tiles = fine_xla.composite_srcover(fr["src_s"], fr["alpha_s"],
                                               fr["g_s"], n_loc,
                                               base_premul)
    dummy = PipelineStatic(caps_key=(), width=width, height=height,
                           kinds_present=(), lowp=lowp)
    img = _tiles_to_image(tiles, dummy, HT, True, u8_out=u8_out)
    return img, fr["overflow"]


_JIT_CACHE = {}
_JIT_B_CACHE = {}
_SPLIT_META = ("n_loc", "ht_local", "WT")


def get_pipeline(static: PipelineStatic, u8_out: bool = False):
    """Two-stage split pipeline for the single-device flat path: geometry
    (prepare_fragments) and composite compile as SEPARATE XLA programs.
    The combined program's optimization time is superlinear in size
    (205 s vs 30+4 s split at the mmark msaa16 tier), and the composite
    half is reused across capacity tiers. ``u8_out`` emits straight-alpha
    RGBA8 directly (the reference's render-target format)."""
    key = (static, u8_out)
    if key in _JIT_CACHE:
        return _JIT_CACHE[key]
    fa = jax.jit(partial(prepare_fragments, static=static))
    bkey = (static.width, static.height, static.lowp, u8_out)
    if bkey not in _JIT_B_CACHE:
        _JIT_B_CACHE[bkey] = jax.jit(partial(
            composite_frame, width=static.width, height=static.height,
            lowp=static.lowp, u8_out=u8_out))
    fb = _JIT_B_CACHE[bkey]

    def run(bufs):
        fr = fa(bufs)
        fr = {k: v for k, v in fr.items() if k not in _SPLIT_META}
        return fb(fr, bufs["base_color"])

    _JIT_CACHE[key] = run
    return run
