"""Isolated microbenchmark of the msaa coverage kernel on REAL bench-scene
data: builds filled_mmark at the bench tier, runs the geometry prefix once to
get the sorted touch stream + rank-ordered backdrop table, then times
msaa_coverage_pallas (and experimental variants) alone.

Usage: python tools/msaa_kernel_bench.py [complexity] [size] [iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    import jax
    import jax.numpy as jnp

    from vello_tpu import RenderParams
    from vello_tpu.encoding.config import Capacities, next_size
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.models.renderer import pack_buffers
    from vello_tpu.ops import tiling, flatten as flatten_ops
    from vello_tpu.ops.segmented import segment_starts
    from vello_tpu.pipeline.render import PipelineStatic, wants_fused_geom
    from vello_tpu.scenes.test_scenes import filled_mmark

    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    scene = filled_mmark(complexity, float(size))
    params = RenderParams(size, size, base_color=(0.1, 0.1, 0.1, 1.0),
                          antialiasing="msaa16")
    rs = resolve(scene.encoding, params)
    caps = rs.capacities(params)
    static = PipelineStatic(
        caps_key=caps.key(), width=size, height=size,
        kinds_present=tuple(sorted(set(int(k) for k in rs.paint_kind))),
        aa="msaa16")
    slim = wants_fused_geom(caps)
    paint8 = slim and set(static.kinds_present) <= {0}
    bufs = jax.device_put({k: np.asarray(v) for k, v in pack_buffers(
        rs, caps, params, slim=slim, paint8=paint8).items()})

    from vello_tpu.encoding.config import TILE_H, TILE_W
    WT = static.width_tiles
    HT = static.height_tiles
    WT_alloc = WT + 1
    W = float(WT_alloc * TILE_W)
    H = float(size)

    @jax.jit
    def geom_prefix(bufs):
        rects = tiling.tile_alloc(bufs["path_rect"], WT_alloc, HT)
        ff = flatten_ops.flatten_fused(
            bufs["seg_pts"], bufs["seg_kind"],
            bufs["seg_path"], bufs["n_segs"], caps.n_lines, W, H,
            tiling.rect_pack(rects))
        touches = tiling.make_touches_from_linepack(
            ff["linepack"], ff["total_lines"], caps.n_touches, caps.n_edges,
            has_edge=static.has_edge)
        tpack = touches["pay"].T
        tix = jnp.arange(tpack.shape[0], dtype=jnp.int32)
        ftile_s, tix_s = jax.lax.sort((touches["ftile"], tix), num_keys=1,
                                      is_stable=False)
        trow = tpack[tix_s]
        seg_ids = jnp.clip(ftile_s, 0, caps.n_path_tiles)
        starts = segment_starts(seg_ids, caps.n_path_tiles)
        from vello_tpu.ops.segmented import (searchsorted_dense,
                                             segment_sum_from_starts)
        bd_sum = segment_sum_from_starts(trow[:, 5], starts)
        bd_delta = jnp.concatenate([jnp.zeros(1, jnp.float32), bd_sum[:-1]])
        t = jnp.arange(caps.n_path_tiles, dtype=jnp.int32)
        incl = rects["base"] + rects["areas"]
        from vello_tpu.ops import segmented
        tpath = segmented.searchsorted_dense(incl, caps.n_path_tiles,
                                             side="right")
        tpath = jnp.clip(tpath, 0, caps.n_paths - 1)
        stride = jnp.maximum(rects["stride"][tpath], 1)
        rel = t - rects["base"][tpath]
        row_start = rects["base"][tpath] + (rel // stride) * stride
        cbd = jnp.cumsum(bd_delta)
        bdpack = jnp.stack([cbd, bd_delta], axis=-1)[row_start]
        backdrop = cbd - bdpack[:, 0] + bdpack[:, 1]
        rule = bufs["fill_rule"][tpath][:, None]
        return trow, starts, backdrop, rule

    trow, starts, backdrop, rule = geom_prefix(bufs)
    trow = jax.device_put(np.asarray(trow))
    starts = jax.device_put(np.asarray(starts))
    backdrop = jax.device_put(np.asarray(backdrop))
    rule = jax.device_put(np.asarray(rule))
    t_touch = int(np.asarray(
        (np.asarray(trow)[:, 6] < caps.n_path_tiles)).sum())
    print(f"T={trow.shape[0]} (real {t_touch}), F={backdrop.shape[0]}")

    from vello_tpu.ops.pallas_kernels import WF_M, msaa_coverage_pallas
    f = backdrop.shape[0]
    ns = 16

    @jax.jit
    def prep_bdr(starts, backdrop, rule):
        has_t = starts[1:] > starts[:-1]
        rank_f = jnp.cumsum(has_t.astype(jnp.int32)) - 1
        key = jnp.where(has_t, rank_f, jnp.int32(2 ** 30))
        _, bd_d, rl_d = jax.lax.sort(
            (key, backdrop, rule[:, 0].astype(jnp.float32)), num_keys=1)
        fpad = f + 8 + WF_M
        return jnp.pad(jnp.stack([bd_d, rl_d], axis=-1),
                       ((0, fpad - f), (0, 126)))

    bdr = jax.device_put(np.asarray(prep_bdr(starts, backdrop, rule)))

    def time_fn(name, fn, *args):
        from devtime import device_ms
        dt = device_ms(fn, *args, iters=iters)
        print(f"{name:40s} {dt:8.3f} ms (device)")
        return fn(*args), dt

    has_eo = bool(np.asarray(rule).any())
    fn0 = jax.jit(lambda tr, bd: msaa_coverage_pallas(
        tr, bd, ns, has_evenodd=has_eo, ft_clip=f))
    out0, dt0 = time_fn("msaa_coverage_pallas (current)", fn0, trow, bdr)

    # experimental variants are timed here as they land
    try:
        from vello_tpu.ops.pallas_kernels import msaa_coverage_pallas_v2
        fn2 = jax.jit(lambda tr, bd: msaa_coverage_pallas_v2(
            tr, bd, ns, has_evenodd=has_eo, ft_clip=f))
        out2, dt2 = time_fn("msaa_coverage_pallas_v2", fn2, trow, bdr)
        d = np.abs(np.asarray(out2, np.float32)
                   - np.asarray(out0, np.float32))
        print(f"v2 vs v0: max abs diff {d.max():.6f}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
