"""Interpret-mode equivalence tests for the fine Pallas kernels.

The test suite runs on CPU (use_pallas() is False), so the TPU kernels'
logic is exercised here via pallas interpret mode against the XLA reference
formulations:

- fine_composite_solid / fine_composite_solid_cov vs composite_srcover
  (the ordered src-over walk of fine.wgsl's PTCL interpreter role)
- msaa_coverage_pallas vs msaa_coverage_xla (fill_path_ms role,
  reference fine.wgsl:146-511 + mask.rs)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vello_tpu.ops import fine_xla
from vello_tpu.ops.pallas_kernels import (FINE_CHUNK, NPX, WF_M,
                                          fine_composite_over,
                                          fine_composite_solid,
                                          fine_composite_solid_cov,
                                          msaa_coverage_pallas)


def _frag_stream(rng, n_frag, n_gtiles):
    g = np.sort(rng.integers(0, n_gtiles, n_frag)).astype(np.int32)
    cov = rng.uniform(0.0, 1.0, (n_frag, NPX)).astype(np.float32)
    a = rng.uniform(0.0, 1.0, (n_frag, 1)).astype(np.float32)
    col = np.concatenate([rng.uniform(0, 1, (n_frag, 3)) * a, a],
                         axis=1).astype(np.float32)
    return g, cov, col


def _starts(g, n_gtiles):
    return np.searchsorted(g, np.arange(n_gtiles + 1),
                           side="left").astype(np.int32)


@pytest.mark.parametrize("n_frag,n_gtiles", [(FINE_CHUNK * 3, 37), (64, 5)])
def test_composite_kernels_match_xla(n_frag, n_gtiles):
    rng = np.random.default_rng(7)
    g, cov, col = _frag_stream(rng, n_frag, n_gtiles)
    base = np.array([0.05, 0.1, 0.2, 1.0], np.float32)
    src = (col[:, :, None] * cov[:, None, :]).astype(np.float32)

    ref = fine_xla.composite_srcover(
        jnp.asarray(src), jnp.asarray(src[:, 3, :]), jnp.asarray(g),
        n_gtiles, jnp.asarray(base))
    got = fine_composite_solid(
        jnp.asarray(src), jnp.asarray(base),
        jnp.asarray(_starts(g, n_gtiles)), n_gtiles, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)

    got2 = fine_composite_solid_cov(
        jnp.asarray(cov), jnp.asarray(col), jnp.asarray(base),
        jnp.asarray(_starts(g, n_gtiles)), n_gtiles, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_composite_over_matches_xla():
    """fine_composite_over (walk onto an existing backdrop — the layered
    draws op) vs composite_srcover_over."""
    rng = np.random.default_rng(11)
    n_frag, n_gtiles = FINE_CHUNK * 2 + 64, 23
    g, cov, col = _frag_stream(rng, n_frag, n_gtiles)
    src = (col[:, :, None] * cov[:, None, :]).astype(np.float32)
    bg = rng.uniform(0, 1, (n_gtiles, 4, NPX)).astype(np.float32)

    ref = fine_xla.composite_srcover_over(
        jnp.asarray(src), jnp.asarray(src[:, 3, :]), jnp.asarray(g),
        jnp.asarray(bg))
    got = fine_composite_over(
        jnp.asarray(src), jnp.asarray(bg),
        jnp.asarray(_starts(g, n_gtiles)), n_gtiles, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_layered_clipped_walk_decomposition():
    """The layered scan's op_draws decomposition: per-(op, tile) walk
    bounds from rank_sorted + fine_composite_over must equal the masked
    full-stream composite for every op range (layered.py wiring)."""
    from vello_tpu.ops.segmented import rank_sorted

    rng = np.random.default_rng(3)
    n_frag, n_gtiles, P = FINE_CHUNK * 2, 9, 40
    g = np.sort(rng.integers(0, n_gtiles, n_frag)).astype(np.int32)
    path = rng.integers(0, P, n_frag).astype(np.int32)
    order = np.lexsort((path, g))
    g, path = g[order], path[order]
    cov = rng.uniform(0.0, 1.0, (n_frag, NPX)).astype(np.float32)
    a = rng.uniform(0.0, 1.0, (n_frag, 1)).astype(np.float32)
    col = np.concatenate([rng.uniform(0, 1, (n_frag, 3)) * a, a],
                         axis=1).astype(np.float32)
    src = (col[:, :, None] * cov[:, None, :]).astype(np.float32)
    bg = rng.uniform(0, 1, (n_gtiles, 4, NPX)).astype(np.float32)

    skey = jnp.asarray(g * (P + 1) + path)
    ga = np.arange(n_gtiles, dtype=np.int32)
    for lo, hi in [(0, P), (10, 25), (25, 25), (0, 1), (39, 40)]:
        m = (path >= lo) & (path < hi)
        ref = fine_xla.composite_srcover_over(
            jnp.asarray(np.where(m[:, None, None], src, 0.0)),
            jnp.asarray(np.where(m[:, None], src[:, 3, :], 0.0)),
            jnp.asarray(g), jnp.asarray(bg))
        q = np.concatenate([ga * (P + 1) + lo, ga * (P + 1) + hi])
        w = np.asarray(rank_sorted(skey, jnp.asarray(q)))
        got = fine_composite_over(
            jnp.asarray(src), jnp.asarray(bg),
            (jnp.asarray(w[:n_gtiles]), jnp.asarray(w[n_gtiles:])),
            n_gtiles, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-5)


@pytest.mark.parametrize("ns", [8, 16])
@pytest.mark.parametrize("seed", [0, 3])
def test_msaa_kernel_matches_xla(ns, seed):
    rng = np.random.default_rng(seed)
    t = 300                                  # not a CK multiple: covers pad
    runlen = rng.integers(1, 7, t)
    fid = np.repeat(np.arange(len(runlen)), runlen)[:t]
    fid = np.sort(fid)
    f = int(fid[-1]) + 1
    # tile-local segments incl. horizontals, verticals, out-of-range rows
    x0 = rng.uniform(-1, 17, t); y0 = rng.uniform(-1, 17, t)
    x1 = x0 + rng.uniform(-4, 4, t); y1 = y0 + rng.uniform(-4, 4, t)
    y1[::11] = y0[::11]                      # horizontal (dy == 0)
    ye = np.where(rng.uniform(size=t) < 0.3, rng.uniform(0, 16, t), 1e9)
    seg = np.stack([x0, y0, x1, y1], axis=1).astype(np.float32)
    yedge = ye.astype(np.float32)
    backdrop = rng.integers(-1, 2, f).astype(np.float32)
    rule = rng.integers(0, 2, (f, 1)).astype(np.int32)
    starts = np.searchsorted(fid, np.arange(f + 1)).astype(np.int32)

    ref = fine_xla.msaa_coverage_xla(
        jnp.asarray(seg), jnp.asarray(yedge), jnp.asarray(starts),
        jnp.asarray(backdrop), jnp.asarray(rule), ns)

    # the kernel derives ranks/boundaries from the ftile column (col 6)
    trow = np.concatenate(
        [seg, yedge[:, None], np.zeros((t, 1), np.float32),
         fid.astype(np.float32)[:, None],
         np.zeros((t, 1), np.float32)], axis=1).astype(np.float32)
    bdr = np.zeros((f + 8 + WF_M, 128), np.float32)
    bdr[:f, 0] = backdrop
    bdr[:f, 1] = rule[:, 0]
    out_t, w0b = msaa_coverage_pallas(jnp.asarray(trow), jnp.asarray(bdr), ns,
                                 has_evenodd=True, ft_clip=f,
                                 interpret=True)
    assert out_t.dtype == jnp.bfloat16   # k/ns coverage sums: bf16-exact
    # block-region output: fragment f's final coverage sits in its
    # CLOSING block's region at b_last*WF + rank - align8(first rank of
    # that block). Every fragment here has >= 1 touch, so rank == fid.
    from vello_tpu.ops.pallas_kernels import CK_M

    t_last = starts[1:] - 1
    b_last = t_last // CK_M
    w0_np = np.asarray(w0b)
    rows = b_last * WF_M + np.arange(f) - w0_np[b_last]
    # the returned window bases must equal the independent construction
    bidx = np.arange(int(b_last.max()) + 1) * CK_M
    ref_w0 = (fid[np.minimum(bidx, len(fid) - 1)] // 8) * 8
    np.testing.assert_array_equal(w0_np[:len(ref_w0)], ref_w0)
    got = np.asarray(out_t, dtype=np.float32)[rows]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=0, atol=1e-5)

    # the has_evenodd=False specialization must agree on nonzero-only data
    bdr0 = bdr.copy(); bdr0[:, 1] = 0.0
    ref0 = fine_xla.msaa_coverage_xla(
        jnp.asarray(seg), jnp.asarray(yedge), jnp.asarray(starts),
        jnp.asarray(backdrop), jnp.asarray(np.zeros_like(rule)), ns)
    out0, _ = msaa_coverage_pallas(jnp.asarray(trow), jnp.asarray(bdr0), ns,
                                has_evenodd=False, ft_clip=f,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out0, dtype=np.float32)[rows],
                               np.asarray(ref0), rtol=0, atol=1e-5)
