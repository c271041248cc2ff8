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
def coverage_cumsum_pallas(seg, y_edge, interpret=False):
    """seg (T,4) f32, y_edge (T,) -> inclusive cumsum of coverage (T, NPX)."""
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


def use_pallas() -> bool:
    if os.environ.get("VELLO_TPU_NO_PALLAS"):
        return False
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
def cumsum_pallas(x, interpret=False):
    """Streaming inclusive cumsum over axis 0 of (T, C) f32 — one pass over
    HBM instead of XLA's multi-pass scan materialization."""
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
# Fused fine composite (solid-color fast path)
#
# Replaces the XLA fragment chain (paint eval -> src materialization ->
# transmittance log/exp composite) for scenes whose paints are all solid
# colors: one pass over the sorted coverage rows, compositing
# dst = src + dst*(1-a) directly in VMEM per global tile. Traffic drops from
# ~1.5 GB of (F,4,256) intermediates to one 67 MB coverage read + 4 MB image
# write. The PTCL-interpreter role of fine.wgsl, minus the bytecode.

FINE_CHUNK = 128  # fragments DMA'd per step (128*4KB = 512KB buffer)


def _fine_kernel(starts_ref,           # scalar prefetch: (G+1,) i32
                 src_hbm,              # HBM: (F, 4, 256) premultiplied src
                 base_ref,             # VMEM: (1, 4) f32 premultiplied
                 out_ref,              # VMEM out: (1, 4, 256)
                 src_buf, win_ref, sem):
    g = pl.program_id(0)
    lo = starts_ref[g]
    hi = starts_ref[g + 1]

    @pl.when(g == 0)
    def _():
        win_ref[0] = -1  # no chunk resident

    base = base_ref[0, :]
    dst = jnp.broadcast_to(base[:, None], (4, NPX)).astype(jnp.float32)

    # Walk chunk-aligned windows covering [lo, hi). The resident-window
    # index persists across grid steps (sequential TPU grid), so
    # consecutive tiles sharing a window skip the DMA — each fragment is
    # fetched ~once per frame instead of once per touched tile.
    c0 = lo // FINE_CHUNK
    c1 = (hi + FINE_CHUNK - 1) // FINE_CHUNK

    def chunk_body(k, dst):
        cidx = c0 + k
        cstart = pl.multiple_of(cidx * FINE_CHUNK, FINE_CHUNK)

        @pl.when(win_ref[0] != cidx)
        def _():
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(cstart, FINE_CHUNK)], src_buf, sem)
            cp.start()
            cp.wait()
            win_ref[0] = cidx

        i_lo = jnp.maximum(lo - cstart, 0)
        i_hi = jnp.minimum(hi - cstart, FINE_CHUNK)

        def frag_body(i, dst):
            src = src_buf[i]                          # (4, 256) premul
            return src + dst * (1.0 - src[3:4, :])

        return jax.lax.fori_loop(i_lo, i_hi, frag_body, dst)

    dst = jax.lax.fori_loop(0, c1 - c0, chunk_body, dst)
    out_ref[0] = dst


def fine_composite_solid(src_sorted, base_premul, starts, n_gtiles,
                         interpret=False):
    """src_sorted (F, 4, 256) premultiplied paint*coverage rows in
    (gtile, order) order; starts (G+1,) i32 per-gtile fragment ranges.
    Sequentially composites dst = src + dst*(1-a) per tile in VMEM —
    exact ordered src-over with no log/exp trick and none of the XLA
    suffix/cumsum/gather passes. Returns (G, 4, 256) composited tiles."""
    # Pad one chunk: dynamic slices clamp their start when out of bounds,
    # which would silently shift the last tiles' fragment windows.
    src_sorted = jnp.concatenate(
        [src_sorted,
         jnp.zeros((FINE_CHUNK,) + src_sorted.shape[1:], src_sorted.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gtiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # src rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base color
        ],
        out_specs=pl.BlockSpec((1, 4, NPX), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FINE_CHUNK, 4, NPX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _fine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_gtiles, 4, NPX), jnp.float32),
        interpret=interpret,
    )(starts, src_sorted, base_premul[None, :])
