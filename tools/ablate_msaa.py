"""Stage-level ablation of the msaa coverage kernel: progressively enable
kernel phases on the REAL bench-tier touch stream to attribute device time.

Usage: python tools/ablate_msaa.py [complexity] [size] [iters]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vello_tpu.ops import pallas_kernels as pk
    from vello_tpu.ops.pallas_kernels import CK_M, WF_M, NPX

    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    ns = 16

    # Real data via the same prefix as msaa_kernel_bench
    import msaa_prep
    trow, bdr, f = msaa_prep.prep(complexity, size)

    def kernel_t(w0_ref, rl_ref, of_ref, ef_ref, trowt_hbm, rkis_hbm,
                 sxy_ref, bdr_hbm, out_ref, bwin_ref, carry_ref, sem, *,
                 stage):
        """Transposed-input variants: trowt (8, T) f32 blocks (8, CK),
        rkis (1, T) blocks (1, CK). stage 100 = IO floor (row reads only),
        101 = +in-kernel (8,CK)->(CK,8) transpose, 102 = full delta from
        transposed fields."""
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        nlive = w0_ref[ng]
        live = g < nlive

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[...] = jnp.zeros((CK_M, NPX), jnp.bfloat16)

        @pl.when(live)
        def _body():
            t8 = trowt_hbm[...]                          # (8, CK)
            rk = rkis_hbm[...]                           # (1, CK)
            if stage == 100:     # IO floor: no transpose
                v = jnp.sum(t8) + jnp.sum(rk)
                out_ref[...] = jnp.full((CK_M, NPX), v,
                                        jnp.float32).astype(jnp.bfloat16)
                return
            tt = jnp.transpose(t8, (1, 0))               # (CK, 8)
            rkc = jnp.transpose(rk, (1, 0))              # (CK, 1)
            if stage == 101:    # + transpose cost
                out_ref[...] = (tt[:, 0:1] + rkc
                                + jnp.zeros((CK_M, NPX), jnp.float32)
                                ).astype(jnp.bfloat16)
                return
            x0, y0 = tt[:, 0:1], tt[:, 1:2]
            x1, y1 = tt[:, 2:3], tt[:, 3:4]
            ymin = jnp.minimum(y0, y1)
            ymax = jnp.maximum(y0, y1)
            dy = y1 - y0
            dx = x1 - x0
            inv_dy = 1.0 / jnp.where(dy == 0.0, 1.0, dy)
            sgn = jnp.where(dy > 0.0, -1.0, 1.0)
            a = inv_dy * dx
            b0 = x0 - y0 * a
            sxc = sxy_ref[0:1, :]
            syc = sxy_ref[1:2, :]
            crossing = (syc >= ymin) & (syc < ymax)
            xt = b0 + syc * a
            delta = jnp.where(crossing & (xt < sxc), sgn, 0.0
                              ).astype(jnp.bfloat16)
            out_ref[...] = delta[:, :NPX] + rkc.astype(jnp.bfloat16)

    def kernel(w0_ref, rl_ref, of_ref, ef_ref, trow_hbm, rkis_hbm, sxy_ref,
               bdr_hbm, out_ref, bwin_ref, carry_ref, sem, *, stage):
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

        if stage >= 4:   # stages that never wait must never start DMAs
            @pl.when(g == 0)
            def _():
                bdr_copy(0, 0).start()

            @pl.when(g + 1 < nlive)
            def _():
                bdr_copy(g + 1, 1 - slot).start()

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[...] = jnp.zeros((CK_M, NPX), jnp.bfloat16)

        @pl.when(live)
        def _body():
            w0 = pl.multiple_of(w0_ref[g], 8)
            t = trow_hbm[...]
            rkis = rkis_hbm[...]
            x0, y0 = t[:, 0:1], t[:, 1:2]
            x1, y1 = t[:, 2:3], t[:, 3:4]
            ye = t[:, 4:5]
            rankf = jnp.floor(rkis * 0.5)
            islast = rkis - 2.0 * rankf
            dx = x1 - x0
            dy = y1 - y0
            ymin = jnp.minimum(y0, y1)
            ymax = jnp.maximum(y0, y1)
            inv_dy = 1.0 / jnp.where(dy == 0.0, 1.0, dy)
            sgn = jnp.where(dy > 0.0, -1.0, 1.0)
            sgn_dx = jnp.sign(dx)
            sxc = sxy_ref[0:1, :]
            syc = sxy_ref[1:2, :]
            if stage == 0:          # IO floor: touch ident -> out
                out_ref[...] = (t[:, 0:1] + jnp.zeros((CK_M, NPX),
                                jnp.float32)).astype(jnp.bfloat16)
                return
            crossing = (syc >= ymin) & (syc < ymax)
            a = inv_dy * dx
            b0 = x0 - y0 * a
            xt = b0 + syc * a
            delta = jnp.where(crossing & (xt < sxc), sgn, 0.0)
            if stage >= 90:         # full delta incl edge term
                delta = delta + jnp.where(syc >= ye, sgn_dx, 0.0)
            delta = delta.astype(jnp.bfloat16)
            if stage in (1, 90):    # delta only
                out_ref[...] = delta[:, :NPX]
                return
            w0f = jax.lax.convert_element_type(w0, jnp.float32)
            ftl_col = rankf - w0f
            wiota_c = jax.lax.broadcasted_iota(
                jnp.int32, (WF_M, 1), 0).astype(jnp.float32)
            wiota_r = jax.lax.broadcasted_iota(
                jnp.int32, (1, WF_M), 1).astype(jnp.float32)
            ohT_fold = (ftl_col == wiota_r).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                ohT_fold, delta, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if stage == 2:          # delta + fold
                out_ref[...] = acc[:CK_M, :NPX].astype(jnp.bfloat16)
                return
            open_id = rl_ref[jnp.maximum(g - 1, 0)]
            ccol = ((wiota_c == jax.lax.convert_element_type(
                open_id - w0, jnp.float32)) & (of_ref[g] > 0))
            acc = acc + jnp.where(ccol, carry_ref[...], 0.0)
            oh_last = (rankf == jax.lax.convert_element_type(
                rl_ref[g], jnp.float32)).astype(jnp.bfloat16)
            csum = jax.lax.dot_general(
                oh_last, delta, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            keep = (of_ref[g] > 0) & (open_id == rl_ref[g])
            carry_ref[...] = csum + jnp.where(keep, carry_ref[...], 0.0)
            if stage == 3:          # + carry machinery
                out_ref[...] = acc[:CK_M, :NPX].astype(jnp.bfloat16)
                return
            bdr_copy(g, slot).wait()
            bd = bwin_ref[slot, :, 0:1]
            w = acc + bd
            covw = jnp.where(w != 0.0, jnp.float32(1.0), jnp.float32(0.0))
            cov = covw[:, :NPX]
            for s in range(1, ns):
                cov = cov + covw[:, s * NPX:(s + 1) * NPX]
            cov = (cov * jnp.float32(1.0 / ns)).astype(jnp.bfloat16)
            if stage == 4:          # + resolve
                out_ref[...] = (cov[:CK_M] + jnp.zeros(
                    (CK_M, NPX), jnp.bfloat16))
                return
            ohT = ohT_fold * (islast > 0.0).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                ohT, cov, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[...] = out.astype(jnp.bfloat16)

    def run(stage, trow, bdr):
        import numpy as _np
        from vello_tpu.ops.fine_xla import sample_offsets
        offs = sample_offsets(ns)
        lin = _np.arange(ns * NPX)
        pxp = (lin % NPX) % 16
        pyp = (lin % NPX) // 16
        sxy = jnp.asarray(_np.stack([
            pxp + _np.repeat([o[0] for o in offs], NPX),
            pyp + _np.repeat([o[1] for o in offs], NPX)]),
            dtype=jnp.float32)
        t0 = trow.shape[0]
        ftcol = jnp.minimum(trow[:, 6], jnp.float32(f + 1))
        diff = ftcol[1:] != ftcol[:-1]
        is_first = jnp.concatenate([jnp.ones(1, bool), diff])
        is_last = jnp.concatenate([diff, jnp.ones(1, bool)])
        rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        rkis = (rank.astype(jnp.float32) * 2.0
                + is_last.astype(jnp.float32))[:, None]
        w0s = (rank[::CK_M] // 8) * 8
        n_real = jnp.sum((ftcol <= jnp.float32(f)).astype(jnp.int32))
        nlive = jnp.clip((n_real + CK_M - 1) // CK_M, 1, t0 // CK_M)
        w0s = jnp.concatenate([w0s, nlive[None]])
        rank_last = rank[CK_M - 1::CK_M]
        open_f = jnp.concatenate([
            jnp.zeros(1, jnp.int32),
            1 - is_last[CK_M - 1::CK_M][:-1].astype(jnp.int32)])
        edge_f = jnp.any(trow[:, 4].reshape(-1, CK_M) < 1e8,
                         axis=1).astype(jnp.int32)
        g = t0 // CK_M
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((CK_M, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CK_M, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, ns * NPX), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((CK_M, NPX), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, WF_M, 128), jnp.float32),
                pltpu.VMEM((1, ns * NPX), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        if stage >= 100:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(g,),
                in_specs=[
                    pl.BlockSpec((8, CK_M), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CK_M), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, ns * NPX), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((CK_M, NPX), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, WF_M, 128), jnp.float32),
                    pltpu.VMEM((1, ns * NPX), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kern = functools.partial(kernel_t, stage=stage)
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((t0, NPX), jnp.bfloat16),
            )(w0s, rank_last, open_f, edge_f, trow.T.copy(),
              rkis.T.copy(), sxy, bdr)
        kern = functools.partial(kernel, stage=stage)
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t0, NPX), jnp.bfloat16),
        )(w0s, rank_last, open_f, edge_f, trow, rkis, sxy, bdr)

    from devtime import device_ms
    prev = 0.0
    for stage, name in [(0, "IO floor"), (1, "+delta (no edge)"),
                        (100, "T: IO floor"), (101, "T: +transpose"),
                        (102, "T: +delta"),
                        (2, "+fold"),
                        (3, "+carry"), (4, "+resolve"), (5, "+out matmul")]:
        fn = jax.jit(functools.partial(run, stage))
        dt = device_ms(fn, trow, bdr, iters=iters)
        print(f"stage {name:24s} {dt:8.3f} ms  (+{dt - prev:6.3f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
