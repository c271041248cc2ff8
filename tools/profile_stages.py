"""Stage-level TPU profiling: time cumulative pipeline prefixes to locate
the hot stages (role of wgpu-profiler per-dispatch timers in the reference).

Usage: python tools/profile_stages.py [complexity] [size]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from vello_tpu import RenderParams
    from vello_tpu.encoding.config import Capacities, TILE_H, TILE_W
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.models.renderer import pack_buffers
    from vello_tpu.ops import fine_xla, flatten as fo, pathtag, tiling
    from vello_tpu.pipeline.render import PipelineStatic, render_frame
    from vello_tpu.scenes.test_scenes import filled_mmark

    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    scene = filled_mmark(complexity, float(size))
    params = RenderParams(size, size, base_color=(0.1, 0.1, 0.1, 1.0))
    rs = resolve(scene.encoding, params)
    caps = rs.capacities(params)
    static = PipelineStatic(
        caps_key=caps.key(), width=size, height=size,
        kinds_present=tuple(sorted(set(int(k) for k in rs.paint_kind))))
    bufs = {k: jax.device_put(np.asarray(v))
            for k, v in pack_buffers(rs, caps, params).items()}
    WT, HT = static.width_tiles + 1, static.height_tiles

    def upto_decode(bufs):
        d = pathtag.decode_and_transform(bufs["tags"], bufs["data"],
                                         bufs["transforms"], bufs["styles"])
        return d["points"].sum()

    def upto_flatten(bufs):
        d = pathtag.decode_and_transform(bufs["tags"], bufs["data"],
                                         bufs["transforms"], bufs["styles"])
        fl = fo.flatten(d, caps.n_lines, caps.n_lines // 4,
                        float(WT * TILE_W), float(size))
        return fl["lines"].sum() + fl["edge_lines"].sum()

    def upto_touches(bufs):
        d = pathtag.decode_and_transform(bufs["tags"], bufs["data"],
                                         bufs["transforms"], bufs["styles"])
        fl = fo.flatten(d, caps.n_lines, caps.n_lines // 4,
                        float(WT * TILE_W), float(size))
        lines = jnp.concatenate([fl["lines"], fl["edge_lines"]])
        lpath = jnp.concatenate([fl["line_path"], fl["edge_path"]])
        rects = tiling.path_tile_rects(fl["lines"], fl["edge_lines"],
                                       fl["line_path"], fl["edge_path"],
                                       caps.n_paths, WT, HT)
        t = tiling.make_touches(lines, lpath, rects, caps.n_touches)
        return t["seg"].sum() + t["ftile"].sum()

    def upto_backdrop(bufs):
        d = pathtag.decode_and_transform(bufs["tags"], bufs["data"],
                                         bufs["transforms"], bufs["styles"])
        fl = fo.flatten(d, caps.n_lines, caps.n_lines // 4,
                        float(WT * TILE_W), float(size))
        lines = jnp.concatenate([fl["lines"], fl["edge_lines"]])
        lpath = jnp.concatenate([fl["line_path"], fl["edge_path"]])
        rects = tiling.path_tile_rects(fl["lines"], fl["edge_lines"],
                                       fl["line_path"], fl["edge_path"],
                                       caps.n_paths, WT, HT)
        t = tiling.make_touches(lines, lpath, rects, caps.n_touches)
        bd = tiling.backdrop_prefix(t["backdrop_idx"], t["backdrop_val"],
                                    rects, caps.n_path_tiles)
        return bd.sum() + t["seg"].sum()

    def upto_sort(bufs):
        d = pathtag.decode_and_transform(bufs["tags"], bufs["data"],
                                         bufs["transforms"], bufs["styles"])
        fl = fo.flatten(d, caps.n_lines, caps.n_lines // 4,
                        float(WT * TILE_W), float(size))
        lines = jnp.concatenate([fl["lines"], fl["edge_lines"]])
        lpath = jnp.concatenate([fl["line_path"], fl["edge_path"]])
        rects = tiling.path_tile_rects(fl["lines"], fl["edge_lines"],
                                       fl["line_path"], fl["edge_path"],
                                       caps.n_paths, WT, HT)
        t = tiling.make_touches(lines, lpath, rects, caps.n_touches)
        bd = tiling.backdrop_prefix(t["backdrop_idx"], t["backdrop_val"],
                                    rects, caps.n_path_tiles)
        tix = jnp.arange(caps.n_touches, dtype=jnp.int32)
        f_s, tix_s = jax.lax.sort((t["ftile"], tix), num_keys=1)
        return f_s.sum() + t["seg"][tix_s].sum() + bd.sum()

    def upto_cov(bufs):
        d = pathtag.decode_and_transform(bufs["tags"], bufs["data"],
                                         bufs["transforms"], bufs["styles"])
        fl = fo.flatten(d, caps.n_lines, caps.n_lines // 4,
                        float(WT * TILE_W), float(size))
        lines = jnp.concatenate([fl["lines"], fl["edge_lines"]])
        lpath = jnp.concatenate([fl["line_path"], fl["edge_path"]])
        rects = tiling.path_tile_rects(fl["lines"], fl["edge_lines"],
                                       fl["line_path"], fl["edge_path"],
                                       caps.n_paths, WT, HT)
        t = tiling.make_touches(lines, lpath, rects, caps.n_touches)
        bd = tiling.backdrop_prefix(t["backdrop_idx"], t["backdrop_val"],
                                    rects, caps.n_path_tiles)
        tix = jnp.arange(caps.n_touches, dtype=jnp.int32)
        f_s, tix_s = jax.lax.sort((t["ftile"], tix), num_keys=1)
        cov = fine_xla.coverage_delta(t["seg"][tix_s], t["y_edge"][tix_s])
        ids = jnp.clip(f_s, 0, caps.n_path_tiles)
        fc = jax.ops.segment_sum(cov, ids,
                                 num_segments=caps.n_path_tiles + 1,
                                 indices_are_sorted=True)
        return fc.sum() + bd.sum()

    def full(bufs):
        img, ov = render_frame(bufs, static)
        return img.sum()

    stages = [("decode", upto_decode), ("flatten", upto_flatten),
              ("touches", upto_touches), ("backdrop", upto_backdrop),
              ("sort", upto_sort), ("coverage", upto_cov), ("full", full)]
    prev = 0.0
    for name, fn in stages:
        j = jax.jit(fn)
        r = j(bufs)
        float(jax.device_get(r))  # real sync (block_until_ready no-ops on axon)
        t0 = time.time()
        for _ in range(5):
            r = j(bufs)
        float(jax.device_get(r))
        dt = (time.time() - t0) / 5
        print(f"{name:10s} cumulative {dt*1e3:8.2f} ms   (+{(dt-prev)*1e3:8.2f} ms)")
        prev = dt


if __name__ == "__main__":
    main()
