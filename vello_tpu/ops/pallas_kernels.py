"""Pallas TPU kernels for the hot fine-raster ops.

``coverage_cumsum``: fuses the exact-area per-pixel winding computation
(fine.wgsl fill_path closed form) with the running cumulative sum that the
segmented reduction consumes. The XLA version materializes the (T, 256)
coverage tensor to HBM and re-reads it for the cumsum (~1 GB of traffic per
frame at the top tier); here each block of touches is computed and
prefix-summed in VMEM, with the inter-block carry living in scratch —
TPU Pallas grids execute sequentially on a core, so carry state across grid
steps is exact.

Enabled by default on TPU; VELLO_TPU_NO_PALLAS=1 falls back to pure XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encoding.config import TILE_H, TILE_W

NPX = TILE_H * TILE_W
BLK = 1024  # touches per grid step


def _cov_kernel(seg_ref, yedge_ref, out_ref, carry_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    seg = seg_ref[...]                       # (BLK, 4)
    yedge = yedge_ref[...]                   # (BLK, 1)
    lin_i = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
    px = jnp.mod(lin_i, TILE_W).astype(jnp.float32)
    py = (lin_i // TILE_W).astype(jnp.float32)
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
    area = area + jnp.sign(dx) * jnp.clip(py - yedge + 1.0, 0.0, 1.0)
    # running prefix sum across the whole stream; cumsum has no Pallas TPU
    # lowering, so Hillis-Steele doubling over the sublane axis (log2 BLK
    # shifted adds, all in VMEM).
    csum = area
    shift = 1
    while shift < BLK:
        shifted = jnp.concatenate(
            [jnp.zeros((shift, NPX), jnp.float32), csum[:BLK - shift]],
            axis=0)
        csum = csum + shifted
        shift *= 2
    csum = csum + carry_ref[...]
    out_ref[...] = csum
    carry_ref[...] = csum[BLK - 1:BLK, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def coverage_cumsum_pallas(seg, y_edge, interpret=None):
    """seg (T,4) f32, y_edge (T,) -> inclusive cumsum of coverage (T, NPX)."""
    interpret = interpret_default() if interpret is None else interpret
    t = seg.shape[0]
    assert t % BLK == 0, t
    grid = (t // BLK,)
    return pl.pallas_call(
        _cov_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, NPX), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, NPX), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, NPX), jnp.float32)],
        interpret=interpret,
    )(seg, y_edge[:, None])


# ---------------------------------------------------------------------------
# Fused sample-mask MSAA coverage
#
# The sample-mask formulation of fine.wgsl's fill_path_ms (reference
# fine.wgsl:146-511 + mask.rs): per-sample winding accumulated per fragment,
# fill rule applied per sample, box resolve — all inside VMEM so the
# (T, ns*256) per-sample tensor never exists in HBM. Touches arrive sorted
# by fragment (ftile); each grid step folds its touch block's per-sample
# deltas into a fragment-window accumulator with a one-hot bf16 MXU matmul
# (deltas are small integers, exact in bf16; accumulation in f32), carries
# the open fragment across blocks, resolves coverage per fragment row, and
# maps it back to each fragment's LAST touch row of the (T, 256) output.

import os as _os_ck
CK_M = int(_os_ck.environ.get("VELLO_TPU_CK_M", "128"))  # touches per grid step
WF_M = ((CK_M + 8 + 7) // 8) * 8   # fragment-window rows: touched-fragment
                           # ids are DENSE ranks in the sorted touch
                           # stream, so a CK-touch block spans <= CK+1
                           # ranks, plus <= 7 rows of align-8 slack on w0.
                           # CK=128 (round 4): the fold matmul turned out
                           # to be fully HIDDEN under the kernel's VPU
                           # delta math (bisect: +fold is time-neutral), so
                           # the old minimize-MACs/touch choice (CK=120,
                           # WF=128) lost to alignment — 128 divides the
                           # 1024-quantum caps exactly and keeps the bf16
                           # out blocks (16,128)-tile aligned (16.0 ->
                           # 15.6 ms at the bench tier).


def _msaa_cov_kernel(w0_ref,           # prefetch (G+1,) i32; only the
                                       # trailing live-block count is read
                     rl_ref,           # prefetch (G,) i32 rank at each
                                       # block's LAST row
                     of_ref,           # prefetch (G,) i32 1 = an open
                                       # fragment carries into this block
                     tpk_hbm,          # VMEM blocked (16, CK): TRANSPOSED
                                       # touch pack — rows 0-7 payload
                                       # fields, row 8 rank*2+islast
                     sxy_ref,          # VMEM (2, ns*256) sample coords
                     bdr_hbm,          # ANY (Fpad, 128) rank-ordered:
                                       # col0 backdrop, col1 rule
                     out_hbm,          # ANY out (G*WF, 256) bf16,
                                       # per-block window regions
                     bwin_ref, carry_ref, cov_ref, rowbuf, sem, osem,
                     *, ns, has_evenodd):
    """Fragment-window MSAA coverage (round 5 revision).

    Structure per round 4 (transposed 8 KB block DMA, one vectorized
    delta chain, fragment-window fold on the MXU with the outgoing carry
    riding an extraction column, register-pass resolve) with two round-5
    changes driven by the ablation (tools/ablate_msaa.py):

    * the output is RANK-indexed: each block DMAs its resolved coverage
      window directly to rows [first_rank, first_rank + WF) of a
      fragment-indexed output — rows of still-open fragments are
      overwritten by the closing block (the sequential grid + chained
      semaphore ordering make the last write win). This deletes the
      back-map one-hot matmul (~1.1 ms/frame) and shrinks the HBM write
      from touch scale to fragment scale (~3.5x at the bench tier).
      Mosaic requires dynamic slice offsets on TILED memrefs (HBM and
      VMEM alike) to be provably divisible by the sublane tiling (8),
      and per-block first ranks are data-dependent — so blocks write
      their windows to DISJOINT block-indexed regions [g*WF, (g+1)*WF)
      (statically aligned: 8 | WF) instead of rank offsets, and the
      assembly gathers fragment f at b_last(f)*WF + rank(f) - w0(b_last)
      — one gather either way. Rows of fragments still open at a block
      boundary hold partial sums in that block's region; the gather
      only ever reads the CLOSING block's region, so no overwrite
      ordering is needed at all.
    """
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    nlive = w0_ref[ng]
    live = g < nlive
    slot = jax.lax.rem(g, 2)

    def bdr_copy(step, buf_slot):
        w = pl.multiple_of(w0_ref[step], 8)
        return pltpu.make_async_copy(
            bdr_hbm.at[pl.ds(w, WF_M)],
            bwin_ref.at[buf_slot], sem.at[buf_slot])

    def out_copy(step, buf_slot):
        return pltpu.make_async_copy(
            cov_ref.at[buf_slot],
            out_hbm.at[pl.ds(pl.multiple_of(step * WF_M, 8), WF_M)],
            osem.at[buf_slot])

    @pl.when(g == 0)
    def _():
        bdr_copy(0, 0).start()
        carry_ref[...] = jnp.zeros_like(carry_ref)

    @pl.when(g + 1 < nlive)
    def _():
        bdr_copy(g + 1, 1 - slot).start()

    # double-buffered output DMA: block g writes cov slot g%2 and only
    # waits the copy issued TWO blocks back, so each 70 KB window write
    # overlaps a full block of compute (a single-slot chain serialized
    # the DMA issue latency into every block: measured +1.4 ms/frame)
    @pl.when((g >= 2) & (g <= nlive + 1))
    def _():
        out_copy(g - 2, slot).wait()

    @pl.when(live)
    def _body():
        _msaa_block(w0_ref, rl_ref, of_ref, tpk_hbm, sxy_ref,
                    bwin_ref, carry_ref, cov_ref, rowbuf, g, slot,
                    bdr_copy, ns=ns, has_evenodd=has_evenodd)
        out_copy(g, slot).start()

    # drain the outstanding writes at the grid tail: regular waits stop
    # at copy g-2, so when the grid ends within two blocks of the live
    # prefix, copies nlive-1 (and the final block's own) remain open
    @pl.when((g == ng - 1) & (g == nlive - 1))
    def _():
        out_copy(g, slot).wait()

    @pl.when((g == ng - 1) & (g >= 1) & (g <= nlive))
    def _():
        out_copy(g - 1, 1 - slot).wait()


def _msaa_block(w0_ref, rl_ref, of_ref, tpk_hbm, sxy_ref,
                bwin_ref, carry_ref, cov_ref, rowbuf, g, slot, bdr_copy,
                *, ns, has_evenodd):
    w0 = pl.multiple_of(w0_ref[g], 8)
    tt = jnp.transpose(tpk_hbm[...], (1, 0))           # (CK, 16)
    x0 = tt[:, 0:1]
    y0 = tt[:, 1:2]
    x1 = tt[:, 2:3]
    y1 = tt[:, 3:4]
    ye = tt[:, 4:5]
    rkis = tt[:, 8:9]
    rankf = jnp.floor(rkis * 0.5)                       # (CK, 1)
    dx = x1 - x0
    dy = y1 - y0
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    inv_dy = 1.0 / jnp.where(dy == 0.0, 1.0, dy)
    sgn = jnp.where(dy > 0.0, -1.0, 1.0)
    sgn_dx = jnp.sign(dx)
    # one vectorized (CK, ns*256) chain: column s*256+px is sample s of
    # pixel px; sample coordinates ride two constant input rows. The
    # whole chain is ONE register pass ending in the scratch write.
    # (bf16 selects here trip a Mosaic i1-relayout error — the masks come
    # from f32 compares in (8,128) layout, bf16 operands need (16,128) —
    # so the deltas stay f32 and convert once at the write.)
    sxc = sxy_ref[0:1, :]                               # (1, ns*256)
    syc = sxy_ref[1:2, :]
    crossing = (syc >= ymin) & (syc < ymax)
    a = inv_dy * dx                                     # narrow precompute
    xt = x0 + (syc - y0) * a
    delta = (jnp.where(crossing & (xt < sxc), sgn, 0.0)
             + jnp.where(syc >= ye, sgn_dx, 0.0)
             ).astype(jnp.bfloat16)                     # (CK, ns*256)

    # ONE fold matmul does window-fold + TWO extraction columns: columns
    # 0..WF are the window rows; column WF matches the block's CLOSING
    # fragment (its dot output is that fragment's delta sum -> the next
    # carry); column WF+1 matches the INCOMING open fragment, giving the
    # nonzero resolve's carry-row fixup its fold sums for free — the
    # matmul computes all WF+8 columns anyway.
    w0f = jax.lax.convert_element_type(w0, jnp.float32)
    ftl_col = rankf - w0f                               # (CK, 1)
    open_id = rl_ref[jnp.maximum(g - 1, 0)]
    last_f = jax.lax.convert_element_type(rl_ref[g] - w0, jnp.float32)
    open_fs = jax.lax.convert_element_type(
        jnp.where(of_ref[g] > 0, open_id - w0, -1), jnp.float32)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (1, WF_M + 8), 1)
    wcols = jnp.where(ciota < WF_M, ciota.astype(jnp.float32),
                      jnp.where(ciota == WF_M, last_f,
                                jnp.where(ciota == WF_M + 1, open_fs,
                                          -3.0)))
    oh_ext = (ftl_col == wcols).astype(jnp.bfloat16)    # (CK, WF+8)
    # f32 accumulation is a Mosaic requirement (bf16 acc fails TPU
    # verification: 'Expected matmul acc to be 32-bit'); the sums are
    # integers <= 2*CK = 256 either way
    full = jax.lax.dot_general(
        oh_ext, delta, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (WF+8, ns*256)
    c = carry_ref[...]                                  # (1, ns*256) f32
    keep = (of_ref[g] > 0) & (open_id == rl_ref[g])
    carry_ref[...] = full[WF_M:WF_M + 1, :] \
        + jnp.where(keep, c, 0.0)
    # the open fragment's window row (-1 matches nothing when closed)
    wiota_c = jax.lax.broadcasted_iota(
        jnp.int32, (WF_M, 1), 0).astype(jnp.float32)    # (WF, 1)
    crow = wiota_c == open_fs                           # (WF, 1) bool

    # resolve coverage per fragment row: + carry-in + backdrop, fill
    # rule per sample, box average — sliced (WF, 256) at a time so the
    # fold output streams through VMEM once instead of 3-4 full passes
    bdr_copy(g, slot).wait()
    bd = bwin_ref[slot, :, 0:1]                         # (WF, 1)
    if has_evenodd:
        rule = bwin_ref[slot, :, 1:2]
    # (column slices of the 1-row replicated carry at lane offsets >= 128
    # trip a Mosaic layout bug when broadcast — reshape to (ns, NPX) so
    # each per-sample slice is a sublane slice at lane offset 0)
    c2 = c.reshape(ns, NPX)
    cov = None
    if has_evenodd:
        for s in range(ns):
            w = full[:WF_M, s * NPX:(s + 1) * NPX] + bd
            w = w + jnp.where(crow, c2[s:s + 1, :], 0.0)
            # even-odd parity needs exact integers beyond bf16's range
            filled = jnp.minimum(jnp.abs(w), 1.0)
            eo = jnp.abs(w - 2.0 * jnp.round(0.5 * w))
            cs = jnp.where(rule == 1.0, eo, filled)
            cov = cs if cov is None else cov + cs
    else:
        # nonzero-only: winding sums are EXACT f32 integers, so
        # (w + bd != 0) == (w != -bd) — a column-broadcast compare, 2
        # VPU ops/element instead of 4 (the resolve is ALU-bound:
        # measured +4.2 ms of the round-4 kernel). The open-fragment
        # CARRY row drops out of the loop entirely and is fixed up once
        # at the end: one M=1 extraction matmul pulls that row's fold
        # sums, its carry-corrected resolve costs (ns, 256), and a
        # single select replaces the corrected row.
        negbd = -bd                                     # (WF, 1)
        for s in range(ns):
            cs = (full[:WF_M, s * NPX:(s + 1) * NPX]
                  != negbd).astype(jnp.float32)
            cov = cs if cov is None else cov + cs
        # the matmul-output row can't lane->sublane reshape in Mosaic;
        # bounce it through a VMEM scratch row (same dodge as c2)
        rowbuf[...] = full[WF_M + 1:WF_M + 2, :]        # (1, ns*256)
        bd_row = jnp.sum(bd * crow, axis=0,
                         keepdims=True)                 # (1, 1)
        wrow = rowbuf[...].reshape(ns, NPX) + c2 + bd_row  # (ns, 256)
        covrow = jnp.sum(
            jnp.where(wrow != 0.0, jnp.float32(1.0), 0.0),
            axis=0, keepdims=True)                      # (1, 256)
        cov = jnp.where(crow, covrow, cov)
    # block-region rows: still-open fragments' rows are partial here;
    # the gather only reads the closing block's region
    cov_ref[slot] = (cov * jnp.float32(1.0 / ns)
                     ).astype(jnp.bfloat16)             # (WF, 256)


def msaa_coverage_pallas(trow, bdr, ns, has_evenodd=True, ft_clip=None,
                         interpret=None):
    """trow (T, 8) f32 fragment-sorted touch rows [x0,y0,x1,y1,y_edge,_,
    ftile,_]; bdr (Fpad, 128) f32 rank-ordered [backdrop, rule]. Fragment
    ranks and run boundaries derive from the sorted ftile column (payload
    col 6, carried through the coarse-sort gather for free) and ride the
    TRANSPOSED (16, T) input pack as row 8 — the transposed pack is one
    dense fused write (the old (T, 8) row-major operand was lane-padded
    128x: a 0.6 ms layout copy + 32-byte strided block DMAs costing
    4 ms/frame inside the kernel; the (T, 1) rank column another 0.5 ms).
    ftile values >= ft_clip (the dump segment) collapse into one trailing
    run. Returns (out, w0b): out (G*WF, 256) bf16 (exact: k/ns sums) in
    per-BLOCK window regions — fragment f's resolved coverage sits at row
    b_last(f)*WF + rank(f) - w0b[b_last(f)] (see _msaa_cov_kernel for why
    regions beat rank offsets on Mosaic) — and w0b (G,) i32, each block's
    aligned window base rank (returned so callers reuse the wrapper's
    rank cumsum instead of recomputing it with searchsorted+gather).
    ``has_evenodd=False`` specializes out the even-odd path."""
    return _msaa_coverage_common(trow, bdr, ns, has_evenodd, ft_clip,
                                 interpret, kernel=_msaa_cov_kernel)


def _msaa_coverage_common(trow, bdr, ns, has_evenodd, ft_clip, interpret,
                          *, kernel):
    interpret = interpret_default() if interpret is None else interpret
    import numpy as _np

    from .fine_xla import sample_offsets
    offs = sample_offsets(ns)
    lin = _np.arange(ns * NPX)
    pxp = (lin % NPX) % TILE_W
    pyp = (lin % NPX) // TILE_W
    sxy = jnp.asarray(_np.stack([
        pxp + _np.repeat([o[0] for o in offs], NPX),
        pyp + _np.repeat([o[1] for o in offs], NPX)]), dtype=jnp.float32)

    if ft_clip is None:
        ft_clip = 2 ** 24       # f32-exact ceiling for raw ftile values
    t0 = trow.shape[0]
    if t0 % CK_M:
        # pad with zero-geometry rows in a run of their OWN (so the final
        # real row keeps is_last; pad output rows are never gathered).
        # Capacity tiers aligned to CK_M skip this concat entirely.
        padn = CK_M - t0 % CK_M
        padrow = jnp.zeros((1, 8), jnp.float32).at[0, 6].set(
            float(ft_clip) + 1.0)
        trow = jnp.concatenate(
            [trow, jnp.broadcast_to(padrow, (padn, 8))])
    t = trow.shape[0]
    # narrow (T,) boundary columns from the sorted ftile payload
    ftcol = jnp.minimum(trow[:, 6], jnp.float32(ft_clip + 1))
    diff = ftcol[1:] != ftcol[:-1]
    is_first = jnp.concatenate([jnp.ones(1, bool), diff])
    is_last = jnp.concatenate([diff, jnp.ones(1, bool)])
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    # packed rank*2 + is_last rides the transposed pack (exact < 2^23)
    rkis = (rank.astype(jnp.float32) * 2.0
            + is_last.astype(jnp.float32))[None, :]     # (1, T)
    # (16, T) transposed pack: the gather's natural column-major output
    # bitcasts into rows 0-7, rkis is row 8, rows 9-15 pad (one fused
    # dense write; every consumer below is lane-major)
    tpk = jnp.concatenate(
        [trow.T, rkis, jnp.zeros((7, t), jnp.float32)], axis=0)
    w0s = (rank[::CK_M] // 8) * 8                       # 8-aligned
    # live-block count: pad rows are dump-tile runs sorted past every real
    # row, so blocks beyond ceil(n_real/CK) skip all math (8-10% of the
    # grid is tier padding at typical caps)
    n_real = jnp.sum((ftcol <= jnp.float32(ft_clip)).astype(jnp.int32))
    nlive = jnp.clip((n_real + CK_M - 1) // CK_M, 1, t // CK_M)
    w0s = jnp.concatenate([w0s, nlive[None]])
    # per-block closing rank + open-fragment flag (prefetched scalars: the
    # kernel must not re-derive these with 1-lane reductions)
    rank_last = rank[CK_M - 1::CK_M]                    # (G,)
    open_f = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        1 - is_last[CK_M - 1::CK_M][:-1].astype(jnp.int32)])
    g = t // CK_M
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((16, CK_M), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ns * NPX), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, WF_M, 128), jnp.float32),
            pltpu.VMEM((1, ns * NPX), jnp.float32),
            pltpu.VMEM((2, WF_M, NPX), jnp.bfloat16),
            pltpu.VMEM((1, ns * NPX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(kernel, ns=ns, has_evenodd=has_evenodd)
    # Block-region output: block g's resolved window (ranks [w0_g,
    # w0_g+WF)) occupies rows [g*WF, (g+1)*WF); callers gather fragment f
    # at b_last(f)*WF + rank(f) - w0(b_last) — rows of non-closing blocks
    # and dead blocks are garbage no caller reads.
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g * WF_M, NPX), jnp.bfloat16),
        interpret=interpret,
    )(w0s, rank_last, open_f, tpk, sxy, bdr)
    return out, w0s[:-1]


def interpret_default() -> bool:
    """VELLO_TPU_PALLAS_INTERPRET=1: run every Pallas kernel in interpret
    mode — lets the CPU-mesh tests exercise the REAL kernel code paths
    (incl. the sharded stripe composite) without a TPU attached."""
    return bool(os.environ.get("VELLO_TPU_PALLAS_INTERPRET"))


def use_pallas() -> bool:
    if os.environ.get("VELLO_TPU_NO_PALLAS"):
        return False
    if interpret_default():
        return True
    return jax.default_backend() == "tpu"


def _cumsum_kernel(x_ref, out_ref, carry_ref, *, blk, cols):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    csum = x_ref[...]
    shift = 1
    while shift < blk:
        shifted = jnp.concatenate(
            [jnp.zeros((shift, cols), jnp.float32), csum[:blk - shift]],
            axis=0)
        csum = csum + shifted
        shift *= 2
    csum = csum + carry_ref[...]
    out_ref[...] = csum
    carry_ref[...] = csum[blk - 1:blk, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cumsum_pallas(x, interpret=None):
    """Streaming inclusive cumsum over axis 0 of (T, C) f32 — one pass over
    HBM instead of XLA's multi-pass scan materialization."""
    interpret = interpret_default() if interpret is None else interpret
    t, c = x.shape
    # VMEM budget: in+out blocks are double-buffered (~4 copies live);
    # keep one block under ~2.5 MB.
    blk = BLK
    while blk * c * 4 > 2_500_000 and blk > 8:
        blk //= 2
    while t % blk != 0:
        blk //= 2
    if blk < 8:
        return jnp.cumsum(x, axis=0)
    grid = (t // blk,)
    kern = functools.partial(_cumsum_kernel, blk=blk, cols=c)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# Fused flatten (curves -> line soup, one kernel)
#
# Replaces the XLA chain (expand sorts + packed row gather + cubic eval +
# y-trim + x-clamp fusions, ~6 ms/frame at the mmark tier) with the same
# window/one-hot pattern as the touch expansion below: segments are
# host-compacted (every real slot emits >= 1 line via Wang's bound), so the
# per-block segment window is bounded; each line evaluates its cubic at
# uniform t, trims/clamps to the viewport, detects left-edge verticals, and
# emits the (16, L) line pack the touch expansion consumes.
# Mirrors flatten.wgsl's role (reference vello_shaders/shader/flatten.wgsl)
# in the TPU formulation of ops/flatten.py.

BLK_F = 1024              # lines per grid step
WIN_F = BLK_F + 256       # segment-window rows (128-aligned start + slack)

_EDGE_EPS = 2.0 ** -10  # must match ops/flatten.py (see rationale there)


def _select_rows_exact(w, oh):
    """One-hot row select dot(w (R, W) f32, oh (B, W) {0,1}) -> (R, B) f32,
    BIT-EXACT at 3 bf16 MXU passes instead of Precision.HIGHEST's 6.

    Exactness: each f32 field splits into hi/mid/lo bf16 whose residual
    subtractions are exact (24-bit mantissa = 3 x 8-bit chunks; each
    residual is exactly representable), every product is field_chunk * 1.0,
    and each output column has at most ONE nonzero term (the window ranges
    [offs, incl) partition the row ids), so the f32 accumulation re-adds
    the three chunks with no rounding: hi+mid = w - r2 (representable),
    +lo = w. XLA's own BF16_3X (Precision.HIGH) is NOT exact here: it
    splits operands 2-way and drops the lo*lo cross term, losing up to 8
    mantissa bits — these are coordinates feeding floor()/DDA decisions
    that must match the host estimator bit-for-bit."""
    ohb = oh.astype(jnp.bfloat16)
    hi = w.astype(jnp.bfloat16)
    r1 = w - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    stacked = jnp.concatenate([hi, mid, lo], axis=0)       # (3R, W) bf16
    r3 = jax.lax.dot_general(stacked, ohb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    n = w.shape[0]
    return r3[:n] + r3[n:2 * n] + r3[2 * n:]


def _flatten_kernel(s0_ref,        # prefetch (G+1,) i32 aligned starts+total
                    spackT_hbm,    # ANY (24, Spad) f32 segment fields
                    out_ref,       # out VMEM (16, B) f32 line pack
                    win_ref, sem, *, width, height, has_stroke=False):
    g = pl.program_id(0)
    ntot = s0_ref[pl.num_programs(0)]
    s0 = pl.multiple_of(s0_ref[g], 128)
    cp = pltpu.make_async_copy(spackT_hbm.at[:, pl.ds(s0, WIN_F)],
                               win_ref, sem)
    cp.start()
    cp.wait()
    w = win_ref[...]                                   # (24, W)
    offs_w = w[9:10, :]
    incl_w = w[10:11, :]
    p = jax.lax.broadcasted_iota(jnp.int32, (BLK_F, 1), 0) + g * BLK_F
    pf = p.astype(jnp.float32)                         # (B, 1)
    oh = ((pf >= offs_w) & (pf < incl_w)).astype(jnp.float32)   # (B, W)
    r = _select_rows_exact(w, oh)                               # (24, B)

    def f(k):
        return r[k:k + 1, :]

    c0x, c0y, c1x, c1y = f(0), f(1), f(2), f(3)
    c2x, c2y, c3x, c3y = f(4), f(5), f(6), f(7)
    n = jnp.maximum(f(8), 1.0)
    offs = f(9)
    rect = r[11:17, :]
    pfr = (jax.lax.broadcasted_iota(jnp.int32, (1, BLK_F), 1)
           + g * BLK_F).astype(jnp.float32)
    sub = pfr - offs
    t0 = sub / n
    t1 = (sub + 1.0) / n

    def ev(t, ca, cb, cc, cd):
        mt = 1.0 - t
        return (mt ** 3 * ca + 3 * mt * mt * t * cb
                + 3 * mt * t * t * cc + t ** 3 * cd)

    if has_stroke:
        from .flatten import STROKE_SLOTS, stroke_slot_line
        mrow = f(20)
        is_st = mrow > 0.5
        msafe = jnp.maximum(mrow, 1.0)
        si = jnp.floor((sub + 0.5) * (1.0 / STROKE_SLOTS))
        se = sub - STROKE_SLOTS * si
        t0 = jnp.where(is_st, si / msafe, t0)
        t1 = jnp.where(is_st, (si + 1.0) / msafe, t1)
        t2 = (si + 2.0) / msafe

    p0x = ev(t0, c0x, c1x, c2x, c3x)
    p0y = ev(t0, c0y, c1y, c2y, c3y)
    p1x = ev(t1, c0x, c1x, c2x, c3x)
    p1y = ev(t1, c0y, c1y, c2y, c3y)

    if has_stroke:
        p2x = ev(t2, c0x, c1x, c2x, c3x)
        p2y = ev(t2, c0y, c1y, c2y, c3y)
        ax, ay, bx, by = stroke_slot_line(
            p0x, p0y, p1x, p1y, p2x, p2y, f(17), f(18), f(19), f(21),
            si, se, msafe)
        p0x = jnp.where(is_st, ax, p0x)
        p0y = jnp.where(is_st, ay, p0y)
        p1x = jnp.where(is_st, bx, p1x)
        p1y = jnp.where(is_st, by, p1y)

    # --- y trim (parametric, exact; same op order as ops/flatten.py) ---
    y0, y1 = p0y, p1y
    dy = y1 - y0
    y0c = jnp.clip(y0, 0.0, height)
    y1c = jnp.clip(y1, 0.0, height)
    nzy = jnp.abs(dy) > 1e-12
    inv_dy = jnp.where(nzy, 1.0 / jnp.where(nzy, dy, 1.0), 0.0)
    ta = jnp.where(nzy, (y0c - y0) * inv_dy, 0.0)
    tb = jnp.where(nzy, (y1c - y0) * inv_dy, 1.0)
    x0 = jnp.where(y0c != y0, p0x + ta * (p1x - p0x), p0x)
    x1 = jnp.where(y1c != y1, p0x + tb * (p1x - p0x), p1x)
    y0, y1 = y0c, y1c
    ntotf = jax.lax.convert_element_type(ntot, jnp.float32)
    real = pfr < ntotf
    alive = real & (jnp.abs(y1 - y0) + jnp.abs(x1 - x0) > 1e-12)

    # --- x clamp + left-edge verticals ---
    lo = _EDGE_EPS
    hi = max(width - _EDGE_EPS, lo + 1e-3)
    x0c = jnp.clip(x0, lo, hi)
    x1c = jnp.clip(x1, lo, hi)
    dx = x1 - x0
    nzx = jnp.abs(dx) > 1e-12
    inv_dx = jnp.where(nzx, 1.0 / jnp.where(nzx, dx, 1.0), 0.0)
    u0 = jnp.where(nzx, jnp.clip((x0c - x0) * inv_dx, 0.0, 1.0), 0.0)
    u1 = jnp.where(nzx, jnp.clip((x1c - x0) * inv_dx, 0.0, 1.0), 1.0)
    ye0 = y0 + u0 * (y1 - y0)
    ye1 = y0 + u1 * (y1 - y0)
    left_all = jnp.maximum(x0, x1) <= lo
    right_all = jnp.minimum(x0, x1) >= hi
    outside = left_all | right_all
    my0 = jnp.where(outside | (x0c == x0), y0, ye0)
    my1 = jnp.where(outside | (x1c == x1), y1, ye1)
    crossing = alive & nzx & (jnp.minimum(x0, x1) < lo) \
        & (jnp.maximum(x0, x1) > lo)
    need_start = crossing & (x0 < x1)
    ev_y0 = jnp.where(need_start, y0, ye1)
    ev_y1 = jnp.where(need_start, ye0, y1)

    # --- orientation + DDA touch count on the mid line ---
    lx0, ly0, lx1, ly1 = x0c, my0, x1c, my1
    is_down = ly1 >= ly0
    qx0 = jnp.where(is_down, lx0, lx1)
    qy0 = jnp.where(is_down, ly0, ly1)
    qx1 = jnp.where(is_down, lx1, lx0)
    qy1 = jnp.where(is_down, ly1, ly0)
    sx0, sy0 = qx0 / TILE_W, qy0 / TILE_H
    sx1, sy1 = qx1 / TILE_W, qy1 / TILE_H
    span_x = jnp.maximum(jnp.ceil(jnp.maximum(sx0, sx1))
                         - jnp.floor(jnp.minimum(sx0, sx1)), 1.0)
    span_y = jnp.maximum(jnp.ceil(jnp.maximum(sy0, sy1))
                         - jnp.floor(jnp.minimum(sy0, sy1)), 1.0)
    count = span_x - 1.0 + span_y
    dxs = jnp.abs(sx1 - sx0)
    dys = sy1 - sy0
    dead = ((dxs + dys) == 0.0) \
        | ((dys == 0.0) & (jnp.floor(sy0) == sy0))
    count = jnp.where(dead, 0.0, count)
    tx1 = rect[2:3, :]
    stride = rect[4:5, :]
    sx_min = jnp.minimum(lx0, lx1) / TILE_W
    on_right = sx_min >= tx1
    live = alive & ~on_right & (stride > 0.0) & (count > 0.0)
    tcount = jnp.where(live, count, 0.0)

    out = jnp.concatenate([
        qx0, qy0, qx1, qy1,
        jnp.where(is_down, 1.0, -1.0),
        tcount,
        live.astype(jnp.float32),
        crossing.astype(jnp.float32),
        ev_y0, ev_y1,
        rect], axis=0)                                 # (16, B)
    out_ref[...] = out


def flatten_pallas(spackT, s0s, n_lines_cap, width, height,
                   has_stroke=False, interpret=None):
    """spackT (24, Spad) f32 segment fields [8 cubic coords, n, offs, incl,
    rect6, hw, jnx, jny, m, join, pad2]; s0s (G+1,) i32 aligned window
    starts + total. Returns the (16, L) line pack [qx0,qy0,qx1,qy1,down,
    tcount,live,needs_edge,ev_y0,ev_y1,rect6]. has_stroke (static) enables
    the device stroke-expansion branch (rows 17-21)."""
    interpret = interpret_default() if interpret is None else interpret
    assert n_lines_cap % BLK_F == 0, n_lines_cap
    g = n_lines_cap // BLK_F
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((16, BLK_F), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((24, WIN_F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_flatten_kernel, width=float(width),
                             height=float(height),
                             has_stroke=bool(has_stroke))
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, n_lines_cap), jnp.float32),
        interpret=interpret,
    )(s0s, spackT)


# ---------------------------------------------------------------------------
# Fused touch expansion (the path_count/path_tiling pair, one kernel)
#
# The XLA formulation needs two big sorts (expand_by_counts) plus a ~10ns/row
# monotone gather of the per-line fields at touch scale (~4.5 ms/frame at the
# mmark tier). Here each grid step DMAs the window of lines covering its
# touch block (guaranteed <= BLK_X + 1 rows because every real line slot
# emits >= 1 touch — dead lines emit one dump-tile dummy), recovers each
# touch's line with one (B, W) compare + one-hot MXU select, and evaluates
# the DDA staircase + tile clip in VMEM. Outputs feed the (ftile, tix) sort.

BLK_X = 1024              # touches per grid step
WIN_X = BLK_X + 256       # line-window rows per step (128-aligned start
                          # + <=128 alignment slack + 1 spanning line)
DUMP_TILE = 2 ** 30

ONE_MINUS_ULP = 0.99999994
ROBUST_EPS = 2e-7
SEG_EPS = 1e-6


def _expand_touch_kernel(s0_ref,        # prefetch (G+1,) i32: 128-aligned
                                        # window starts, then the total
                         lpackT_hbm,    # ANY (16, Lpad) f32 line fields
                         pay_ref,       # out VMEM (8, B) f32
                         win_ref, sem):
    g = pl.program_id(0)
    ntot = s0_ref[pl.num_programs(0)]
    s0 = pl.multiple_of(s0_ref[g], 128)
    cp = pltpu.make_async_copy(lpackT_hbm.at[:, pl.ds(s0, WIN_X)],
                               win_ref, sem)
    cp.start()
    cp.wait()
    w = win_ref[...]                                   # (16, W)
    offs_w = w[5:6, :]
    incl_w = w[6:7, :]
    p = jax.lax.broadcasted_iota(jnp.int32, (BLK_X, 1), 0) + g * BLK_X
    pf = p.astype(jnp.float32)                         # (B, 1)
    oh = ((pf >= offs_w) & (pf < incl_w)).astype(jnp.float32)   # (B, W)
    # one-hot row select on the MXU (bit-exact 3-pass bf16 split)
    r = _select_rows_exact(w, oh)                               # (16, B)

    def f(k):
        return r[k:k + 1, :]                           # (1, B)

    qx0, qy0, qx1, qy1, down = f(0), f(1), f(2), f(3), f(4)
    offs, live = f(5), f(7)
    tx0, ty0, tx1, ty1, stride, base = (f(8), f(9), f(10), f(11), f(12),
                                        f(13))
    pfr = (jax.lax.broadcasted_iota(jnp.int32, (1, BLK_X), 1)
           + g * BLK_X).astype(jnp.float32)            # (1, B) row iota
    i = pfr - offs

    # --- DDA staircase (same op order as tiling._dda_from_q) ---
    sx0, sy0 = qx0 / TILE_W, qy0 / TILE_H
    sx1, sy1 = qx1 / TILE_W, qy1 / TILE_H
    span_x = jnp.maximum(jnp.ceil(jnp.maximum(sx0, sx1))
                         - jnp.floor(jnp.minimum(sx0, sx1)), 1.0)
    span_y = jnp.maximum(jnp.ceil(jnp.maximum(sy0, sy1))
                         - jnp.floor(jnp.minimum(sy0, sy1)), 1.0)
    count_x = span_x - 1.0
    count = count_x + span_y
    dx = jnp.abs(sx1 - sx0)
    dy = sy1 - sy0
    denom = dx + dy
    zero_len = denom == 0.0
    idxdy = 1.0 / jnp.where(zero_len, 1.0, denom)
    a = dx * idxdy
    pos_slope = sx1 >= sx0
    sign_x = jnp.where(pos_slope, 1.0, -1.0)
    xt0 = jnp.floor(sx0 * sign_x)
    c = sx0 * sign_x - xt0
    y0i = jnp.floor(sy0)
    ytop = jnp.where(sy0 == sy1, jnp.ceil(sy0), y0i + 1.0)
    b = jnp.minimum((dy * c + dx * (ytop - sy0)) * idxdy, ONE_MINUS_ULP)
    err = jnp.floor(a * (count - 1.0) + b) - count_x
    a = jnp.where(err != 0.0, a - ROBUST_EPS * jnp.sign(err), a)
    x0i_f = xt0 * sign_x + jnp.where(pos_slope, 0.0, -1.0)

    z = jnp.floor(a * i + b)
    x = jnp.clip(x0i_f + sign_x * z, tx0, tx1 - 1.0)
    y = jnp.clip(y0i + i - z, ty0, ty1 - 1.0)
    ntotf = jax.lax.convert_element_type(ntot, jnp.float32)
    tvalid = (pfr < ntotf) & (live > 0.0)
    ftile_f = base + (y - ty0) * stride + (x - tx0)
    # rides the payload as f32 (exact: tile ids < 2^24, DUMP = 2^30 exact)
    ftile = jnp.where(tvalid, ftile_f, jnp.float32(DUMP_TILE))

    # --- backdrop (top-edge crossing targets tile x+1) ---
    z_prev = jnp.floor(a * (i - 1.0) + b)
    # (select between f32, not i1 vectors — Mosaic can't truncate i8->i1)
    top_edge = jnp.where(i == 0.0,
                         (jnp.floor(sy0) == sy0).astype(jnp.float32),
                         (z == z_prev).astype(jnp.float32)) > 0.0
    delta = jnp.where(down > 0.0, -1.0, 1.0)
    b_ok = tvalid & top_edge & (x + 1.0 < tx1)
    backdrop_val = jnp.where(b_ok, delta, 0.0)

    # --- clip the segment to the tile (same op order as make_touches) ---
    tile_x = x * TILE_W
    tile_y = y * TILE_H
    tile_x1 = tile_x + TILE_W
    tile_y1 = tile_y + TILE_H
    dxl = qx1 - qx0
    dyl = qy1 - qy0
    inv_dyl = 1.0 / jnp.where(dyl == 0.0, 1.0, dyl)
    inv_dxl = 1.0 / jnp.where(dxl == 0.0, 1.0, dxl)

    z_same_prev = z == z_prev
    xt_top = qx0 + dxl * (tile_y - qy0) * inv_dyl
    xt_top = jnp.clip(xt_top, tile_x + 1e-3, tile_x1)
    x_clip_e = jnp.where(pos_slope, tile_x, tile_x1)
    yt_side = qy0 + dyl * (x_clip_e - qx0) * inv_dxl
    yt_side = jnp.clip(yt_side, tile_y + 1e-3, tile_y1)
    ex = jnp.where(z_same_prev, xt_top, x_clip_e)
    ey = jnp.where(z_same_prev, tile_y, yt_side)
    px0 = jnp.where(i > 0.0, ex, qx0)
    py0 = jnp.where(i > 0.0, ey, qy0)

    z_next = jnp.floor(a * (i + 1.0) + b)
    z_same_next = z == z_next
    xt_bot = qx0 + dxl * (tile_y1 - qy0) * inv_dyl
    xt_bot = jnp.clip(xt_bot, tile_x + 1e-3, tile_x1)
    x_clip_x = jnp.where(pos_slope, tile_x1, tile_x)
    yt_side2 = qy0 + dyl * (x_clip_x - qx0) * inv_dxl
    yt_side2 = jnp.clip(yt_side2, tile_y + 1e-3, tile_y1)
    lx = jnp.where(z_same_next, xt_bot, x_clip_x)
    ly = jnp.where(z_same_next, tile_y1, yt_side2)
    last = i >= count - 1.0
    px1 = jnp.where(last, qx1, lx)
    py1 = jnp.where(last, qy1, ly)

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
    on_grid0 = (p0x == jnp.floor(p0x)) & (p0x != 0.0)
    on_grid1 = (p1x == jnp.floor(p1x)) & (p1x != 0.0)
    p0x = jnp.where(on_grid0, p0x - eps, p0x)
    p1x = jnp.where(on_grid1, p1x - eps, p1x)
    is_down = down > 0.0
    s0x = jnp.where(is_down, p0x, p1x)
    s0y = jnp.where(is_down, p0y, p1y)
    s1x = jnp.where(is_down, p1x, p0x)
    s1y = jnp.where(is_down, p1y, p0y)

    vmask = tvalid
    zero = jnp.zeros_like(s0x)
    pay = jnp.concatenate([
        jnp.where(vmask, s0x, zero), jnp.where(vmask, s0y, zero),
        jnp.where(vmask, s1x, zero), jnp.where(vmask, s1y, zero),
        jnp.where(vmask, y_edge, jnp.full_like(y_edge, 1e9)),
        backdrop_val, ftile, zero], axis=0)            # (8, B)
    pay_ref[...] = pay


def expand_touches_pallas(lpack, s0s, n_touch_cap, interpret=None):
    """lpack (16, Lpad) f32 per-line fields (see tiling.make_touches),
    s0s (G+1,) i32 128-aligned window starts + total. Returns (ftile (T,)
    i32, payload (8, T) f32 rows [s0x,s0y,s1x,s1y,y_edge,backdrop,_,_])."""
    interpret = interpret_default() if interpret is None else interpret
    assert n_touch_cap % BLK_X == 0, n_touch_cap
    g = n_touch_cap // BLK_X
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, BLK_X), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16, WIN_X), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    pay = pl.pallas_call(
        _expand_touch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_touch_cap), jnp.float32),
        interpret=interpret,
    )(s0s, lpack)
    ftile = pay[6].astype(jnp.int32)
    return ftile, pay


# ---------------------------------------------------------------------------
# Fused fine composite (solid-color fast path)
#
# Replaces the XLA fragment chain (paint eval -> src materialization ->
# transmittance log/exp composite) for scenes whose paints are all solid
# colors. The PTCL-interpreter role of fine.wgsl, minus the bytecode.
#
# v2 (round 4): the per-fragment sequential walk (a latency-bound fori_loop,
# ~40 ns/fragment) is replaced by CHUNK-VECTORIZED segmented compositing:
# each 128-fragment chunk is processed ONCE for all tiles of the grid step —
# ordered src-over  out = sum_i src_i * prod_{j>i} m_j  (m = 1-alpha) is
# computed with two mask matmuls on the MXU (a strict-upper same-tile mask
# for the suffix log-transmittances, the row->tile one-hot for the per-tile
# partials) and one log/exp pair on the VPU. Per-fragment cost drops from
# ~40 ns (serial) to ~5 ns (vectorized), and is insensitive to how many
# tiles a chunk spans.

FINE_CHUNK = 128  # fragments DMA'd per step (128*4KB = 512KB buffer)


FINE_TB = 8       # gtiles composited per grid step (amortizes step overhead)

_LOG_FLOOR = -30000.0   # stands in for log(0): exp underflows to EXACTLY 0,
                        # so an opaque fragment fully occludes (the
                        # _transmittance hard-zero contract of fine_xla);
                        # matmul-safe, unlike -inf (0 * -inf = NaN).


def _step_bounds(lo_ref, hi_ref, step, tb=FINE_TB):
    """(1, TB) i32 lo/hi bound vectors for this step's tiles, built from
    the SMEM scalars with nested lane selects (a (2, TB) VMEM input would
    need a 128-divisible lane block)."""
    tcol = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
    lov = jnp.zeros((1, tb), jnp.int32)
    hiv = jnp.zeros((1, tb), jnp.int32)
    for t in range(tb):
        lov = jnp.where(tcol == t, lo_ref[step * tb + t], lov)
        hiv = jnp.where(tcol == t, hi_ref[step * tb + t], hiv)
    return lov, hiv


def _chunk_masks(cstart, lov, hiv):
    """Row->tile one-hot O (CHUNK, TB) and strict-upper same-tile mask
    S (CHUNK, CHUNK) for the chunk starting at global row cstart.
    lov/hiv: (1, TB) i32 walk bounds of this step's tiles."""
    rows = (jax.lax.broadcasted_iota(jnp.int32, (FINE_CHUNK, 1), 0)
            + cstart)
    o = ((rows >= lov) & (rows < hiv)).astype(jnp.float32)
    same = jax.lax.dot_general(o, o, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (FINE_CHUNK, FINE_CHUNK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (FINE_CHUNK, FINE_CHUNK), 1)
    s = same * (jj > ii).astype(jnp.float32)
    return o, s


def _mask_dot2(mask_bf16, vals_f32, contract):
    """dot(mask, vals) at ~2^-17 relative accuracy in 2 bf16 MXU passes:
    the mask is exact 0/1 in bf16; the values split into hi/lo bf16 chunks
    (lo is the exactly-representable residual), so each product term
    carries ~16 mantissa bits — far below u8 output quantization (1/255 =
    2^-8) and 20x tighter than a plain bf16 matmul. Mosaic has no
    Precision.HIGH, and HIGHEST (6 passes) measured 3.5 ms vs 2.4 ms for
    the composite at the bench tier."""
    hi = vals_f32.astype(jnp.bfloat16)
    lo = (vals_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for part in (hi, lo):
        d = jax.lax.dot_general(mask_bf16, part,
                                (((contract,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _composite_chunk(dst, o, s, srcw, logm):
    """One vectorized composite step: fold a chunk's fragments into the
    per-tile accumulators. dst (TB, 4, NPX); o (CHUNK, TB); s strict-upper
    same-tile (CHUNK, CHUNK); srcw (CHUNK, 4*NPX) premultiplied src rows
    (channel-major quads); logm (CHUNK, NPX) log(1-alpha)."""
    ob = o.astype(jnp.bfloat16)
    sb = s.astype(jnp.bfloat16)
    # suffix log-transmittance per row: sum of logm over LATER same-tile rows
    suff = _mask_dot2(sb, logm, 1)                           # (CHUNK, NPX)
    t = jnp.exp(jnp.minimum(suff, 0.0))                      # (CHUNK, NPX)
    # per-tile partials: P[t] = sum_i o[i,t] * src_i * T_i,
    # pm[t] = exp(sum_i o[i,t] * logm_i)
    w = srcw * jnp.concatenate([t, t, t, t], axis=1)         # (CHUNK, 4NPX)
    p = _mask_dot2(ob, w, 0)                                 # (TB, 4NPX)
    pml = _mask_dot2(ob, logm, 0)                            # (TB, NPX)
    pm = jnp.exp(jnp.minimum(pml, 0.0))
    tb = dst.shape[0]
    p3 = p.reshape(tb, 4, NPX)
    return p3 + pm[:, None, :] * dst


def _fine_kernel(lo_ref,              # scalar prefetch: (Gpad,) i32 per-tile
                                       # walk starts (occlusion-advanced)
                 hi_ref,               # scalar prefetch: (Gpad,) i32 ends
                 src_hbm,              # HBM: (F, 4, 256) premultiplied src
                 base_ref,             # VMEM: (1, 4) f32 premultiplied
                 out_ref,              # VMEM out: (FINE_TB, 4, 256)
                 src_buf, win_ref, sem):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        win_ref[0] = -1  # no chunk resident

    base = base_ref[0, :]
    lov, hiv = _step_bounds(lo_ref, hi_ref, step)
    lo = lo_ref[step * FINE_TB]
    hi = hi_ref[step * FINE_TB + FINE_TB - 1]
    dst = jnp.broadcast_to(base[None, :, None],
                           (FINE_TB, 4, NPX)).astype(jnp.float32)
    # Walk chunk-aligned windows covering the step's whole fragment span.
    # The resident-window index persists across grid steps (sequential TPU
    # grid), so consecutive steps sharing a boundary chunk skip the DMA.
    c0 = lo // FINE_CHUNK
    c1 = (hi + FINE_CHUNK - 1) // FINE_CHUNK

    def chunk_body(k, dst, c0=c0):
        cidx = c0 + k
        cstart = pl.multiple_of(cidx * FINE_CHUNK, FINE_CHUNK)

        @pl.when(win_ref[0] != cidx)
        def _():
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(cstart, FINE_CHUNK)], src_buf, sem)
            cp.start()
            cp.wait()
            win_ref[0] = cidx

        o, s = _chunk_masks(cstart, lov, hiv)
        src = src_buf[...].astype(jnp.float32)        # (CHUNK, 4, NPX)
        alpha = src[:, 3, :]
        logm = jnp.maximum(jnp.log(jnp.maximum(1.0 - alpha, 0.0)),
                           _LOG_FLOOR)
        srcw = src.reshape(FINE_CHUNK, 4 * NPX)
        return _composite_chunk(dst, o, s, srcw, logm)

    dst = jax.lax.fori_loop(0, c1 - c0, chunk_body, dst)
    out_ref[...] = dst


def fine_composite_solid(src_sorted, base_premul, starts, n_gtiles,
                         interpret=None):
    """src_sorted (F, 4, 256) premultiplied paint*coverage rows in
    (gtile, order) order; starts (G+1,) i32 per-gtile fragment ranges.
    Sequentially composites dst = src + dst*(1-a) per tile in VMEM —
    exact ordered src-over with no log/exp trick and none of the XLA
    suffix/cumsum/gather passes. Returns (G, 4, 256) composited tiles.

    ``starts`` may be (G+1,) contiguous ranges, or a (los, his) pair
    where per-tile walk starts were advanced past occluded fragments
    (the DepthBuffer role of vello_cpu/src/coarse/depth.rs)."""
    interpret = interpret_default() if interpret is None else interpret
    if src_sorted.shape[0] % FINE_CHUNK != 0:
        # Chunk windows must stay in bounds (dynamic slices clamp their
        # start, silently shifting the last tiles' fragment windows).
        # Capacity tiers are always chunk-aligned, so this pad (a full copy
        # of the src tensor) only triggers for hand-built sizes.
        pad = FINE_CHUNK - src_sorted.shape[0] % FINE_CHUNK
        src_sorted = jnp.concatenate(
            [src_sorted,
             jnp.zeros((pad,) + src_sorted.shape[1:], src_sorted.dtype)])
    los, his = _los_his(starts, n_gtiles)
    gpad = los.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gpad // FINE_TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # src rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base color
        ],
        out_specs=pl.BlockSpec((FINE_TB, 4, NPX), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FINE_CHUNK, 4, NPX), src_sorted.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _fine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gpad, 4, NPX), jnp.float32),
        interpret=interpret,
    )(los, his, src_sorted, base_premul[None, :])
    return out[:n_gtiles]


OVER_TB = 32      # gtiles per step for the layered draws walk: each op's
                  # walk visits few fragments per tile, so the per-step
                  # floor (bg in + out DMA + bounds build) dominates — a
                  # wider block quarters the step count (measured below)


def _fine_kernel_over(lo_ref,         # scalar prefetch: (Gpad,) i32
                      hi_ref,          # scalar prefetch: (Gpad,) i32
                      src_hbm,         # HBM: (F, 4, 256) premultiplied src
                      bg_ref,          # VMEM in: (OVER_TB, 4, 256) backdrop
                      out_ref,         # VMEM out: (OVER_TB, 4, 256)
                      src_buf, win_ref, sem):
    """fine_composite_solid over an EXISTING per-tile backdrop — the
    layered compositor's draws op. Identical ordered src-over walk; dst
    starts from the bg block instead of a broadcast base color."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        win_ref[0] = -1

    lov, hiv = _step_bounds(lo_ref, hi_ref, step, tb=OVER_TB)
    lo = lo_ref[step * OVER_TB]
    hi = hi_ref[step * OVER_TB + OVER_TB - 1]
    dst = bg_ref[...].astype(jnp.float32)
    c0 = lo // FINE_CHUNK
    c1 = (hi + FINE_CHUNK - 1) // FINE_CHUNK

    def chunk_body(k, dst, c0=c0):
        cidx = c0 + k
        cstart = pl.multiple_of(cidx * FINE_CHUNK, FINE_CHUNK)

        @pl.when(win_ref[0] != cidx)
        def _():
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(cstart, FINE_CHUNK)], src_buf, sem)
            cp.start()
            cp.wait()
            win_ref[0] = cidx

        o, sw = _chunk_masks(cstart, lov, hiv)
        src = src_buf[...].astype(jnp.float32)        # (CHUNK, 4, NPX)
        alpha = src[:, 3, :]
        logm = jnp.maximum(jnp.log(jnp.maximum(1.0 - alpha, 0.0)),
                           _LOG_FLOOR)
        srcw = src.reshape(FINE_CHUNK, 4 * NPX)
        return _composite_chunk(dst, o, sw, srcw, logm)

    dst = jax.lax.fori_loop(0, c1 - c0, chunk_body, dst)
    out_ref[...] = dst


def fine_composite_over(src_sorted, bg_tiles, starts, n_gtiles,
                        interpret=None):
    """Ordered src-over of each tile's [lo, hi) fragment walk onto an
    existing (>=G, 4, 256) backdrop (the layered draws op). ``starts``:
    (G+1,) contiguous ranges or a clipped per-op (los, his) pair — per-op
    clipping makes the whole layered composite O(total fragments) instead
    of O(fragments x ops). bg_tiles rows past n_gtiles (stack padding)
    pass through untouched by the walk but ARE recomposited as empty
    walks; callers slice [:n_gtiles] anyway."""
    interpret = interpret_default() if interpret is None else interpret
    if src_sorted.shape[0] % FINE_CHUNK != 0:
        pad = FINE_CHUNK - src_sorted.shape[0] % FINE_CHUNK
        src_sorted = jnp.concatenate(
            [src_sorted,
             jnp.zeros((pad,) + src_sorted.shape[1:], src_sorted.dtype)])
    los, his = _los_his(starts, n_gtiles, tb=OVER_TB)
    gpad = los.shape[0]
    if bg_tiles.shape[0] < gpad:
        bg_tiles = jnp.concatenate(
            [bg_tiles, jnp.zeros((gpad - bg_tiles.shape[0], 4, NPX),
                                 bg_tiles.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gpad // OVER_TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # src rows stay in HBM
            pl.BlockSpec((OVER_TB, 4, NPX), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OVER_TB, 4, NPX), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FINE_CHUNK, 4, NPX), src_sorted.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _fine_kernel_over,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gpad, 4, NPX), jnp.float32),
        interpret=interpret,
    )(los, his, src_sorted, bg_tiles[:gpad])
    return out[:n_gtiles]


def _los_his(starts, n_gtiles, tb=FINE_TB):
    """Normalize (G+1,) contiguous starts or a (los, his) pair into
    tb-padded per-tile (los, his) arrays. Padded tiles get
    lo = hi = his[-1]: empty, AND monotone — the vectorized kernel reads
    the step's span as [los[first], his[last]], so a zero pad would
    truncate the last step's real tiles."""
    if isinstance(starts, tuple):
        los, his = starts
    else:
        los, his = starts[:-1], starts[1:]
    gpad = (n_gtiles + tb - 1) // tb * tb
    if los.shape[0] < gpad:
        pad = gpad - los.shape[0]
        end = his[-1]
        los = jnp.concatenate([los, jnp.full(pad, end, los.dtype)])
        his = jnp.concatenate([his, jnp.full(pad, end, his.dtype)])
    return los, his


def _fine_cov_kernel(lo_ref,           # scalar prefetch: (Gpad,) i32
                     hi_ref,           # scalar prefetch: (Gpad,) i32
                     cov_hbm,          # HBM: (F, 256) coverage rows
                     col_hbm,          # HBM: (F, 128) premultiplied colors
                                       # in cols 0..3 (HBM DMA slices must
                                       # be 128-lane aligned)
                     base_ref,         # VMEM: (1, 4) f32 premultiplied
                     out_ref,          # VMEM out: (FINE_TB, 4, 256)
                     cov_buf, col_buf, win_ref, sem, sem2):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        win_ref[0] = -1

    base = base_ref[0, :]
    lov, hiv = _step_bounds(lo_ref, hi_ref, step)
    lo = lo_ref[step * FINE_TB]
    hi = hi_ref[step * FINE_TB + FINE_TB - 1]
    dst = jnp.broadcast_to(base[None, :, None],
                           (FINE_TB, 4, NPX)).astype(jnp.float32)
    c0 = lo // FINE_CHUNK
    c1 = (hi + FINE_CHUNK - 1) // FINE_CHUNK

    def chunk_body(k, dst, c0=c0):
        cidx = c0 + k
        cstart = pl.multiple_of(cidx * FINE_CHUNK, FINE_CHUNK)

        @pl.when(win_ref[0] != cidx)
        def _():
            cp = pltpu.make_async_copy(
                cov_hbm.at[pl.ds(cstart, FINE_CHUNK)], cov_buf, sem)
            cp.start()
            cp2 = pltpu.make_async_copy(
                col_hbm.at[pl.ds(cstart, FINE_CHUNK)], col_buf, sem2)
            cp2.start()
            cp.wait()
            cp2.wait()
            win_ref[0] = cidx

        o, s = _chunk_masks(cstart, lov, hiv)
        # color x coverage rows form in registers, never in HBM
        cov = cov_buf[...].astype(jnp.float32)        # (CHUNK, NPX)
        col = col_buf[...].astype(jnp.float32)        # (CHUNK, 128)
        alpha = col[:, 3:4] * cov
        logm = jnp.maximum(jnp.log(jnp.maximum(1.0 - alpha, 0.0)),
                           _LOG_FLOOR)
        srcw = jnp.concatenate([col[:, c:c + 1] * cov for c in range(4)],
                               axis=1)                # (CHUNK, 4*NPX)
        return _composite_chunk(dst, o, s, srcw, logm)

    dst = jax.lax.fori_loop(0, c1 - c0, chunk_body, dst)
    out_ref[...] = dst


def fine_composite_solid_cov(cov_sorted, colors, base_premul, starts,
                             n_gtiles, interpret=None):
    """Solid-paint composite from (F, 256) coverage + (F, 4) premultiplied
    colors: the (F, 4, 256) src tensor (805 MB at the bench tier) never
    exists — rows are formed in VMEM. Same ordered src-over walk as
    fine_composite_solid."""
    interpret = interpret_default() if interpret is None else interpret
    if cov_sorted.shape[0] % FINE_CHUNK != 0:
        pad = FINE_CHUNK - cov_sorted.shape[0] % FINE_CHUNK
        cov_sorted = jnp.concatenate(
            [cov_sorted, jnp.zeros((pad, NPX), cov_sorted.dtype)])
        colors = jnp.concatenate(
            [colors, jnp.zeros((pad, 4), colors.dtype)])
    # 128-lane pad: Mosaic HBM DMA slices must be lane-tile aligned
    colors = jnp.pad(colors, ((0, 0), (0, 128 - colors.shape[1])))
    los, his = _los_his(starts, n_gtiles)
    gpad = los.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gpad // FINE_TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FINE_TB, 4, NPX), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FINE_CHUNK, NPX), cov_sorted.dtype),
            pltpu.VMEM((FINE_CHUNK, 128), colors.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _fine_cov_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gpad, 4, NPX), jnp.float32),
        interpret=interpret,
    )(los, his, cov_sorted, colors, base_premul[None, :])
    return out[:n_gtiles]
