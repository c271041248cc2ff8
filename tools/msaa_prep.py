"""Shared prep for msaa kernel micro/ablation benches: run the geometry
prefix of the real pipeline at the bench tier, return the fragment-sorted
touch stream and rank-ordered backdrop table."""

import sys

import numpy as np

sys.path.insert(0, ".")


def prep(complexity, size):
    import jax
    import jax.numpy as jnp

    from vello_tpu import RenderParams
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.models.renderer import pack_buffers
    from vello_tpu.ops import tiling, flatten as flatten_ops
    from vello_tpu.ops.segmented import segment_starts
    from vello_tpu.pipeline.render import PipelineStatic, wants_fused_geom
    from vello_tpu.scenes.test_scenes import filled_mmark
    from vello_tpu.encoding.config import TILE_W

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
            ff["linepack"], ff["total_lines"], caps.n_touches,
            caps.n_edges, has_edge=static.has_edge)
        tpack = touches["pay"].T
        tix = jnp.arange(tpack.shape[0], dtype=jnp.int32)
        ftile_s, tix_s = jax.lax.sort((touches["ftile"], tix), num_keys=1,
                                      is_stable=False)
        trow = tpack[tix_s]
        seg_ids = jnp.clip(ftile_s, 0, caps.n_path_tiles)
        starts = segment_starts(seg_ids, caps.n_path_tiles)
        from vello_tpu.ops import segmented
        from vello_tpu.ops.segmented import segment_sum_from_starts
        bd_sum = segment_sum_from_starts(trow[:, 5], starts)
        bd_delta = jnp.concatenate([jnp.zeros(1, jnp.float32),
                                    bd_sum[:-1]])
        t = jnp.arange(caps.n_path_tiles, dtype=jnp.int32)
        incl = rects["base"] + rects["areas"]
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
    f = backdrop.shape[0]

    from vello_tpu.ops.pallas_kernels import WF_M

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
    trow = jax.device_put(np.asarray(trow))
    return trow, bdr, f
