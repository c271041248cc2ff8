"""Stage-level TPU profiling of the real pipeline (cumulative prefixes),
with criterion-style per-GROUP JSON output (the reference's vello_bench
groups, sparse_strips/vello_bench/benches/main.rs:10-27: encode / flatten /
tile / sort(strip) / fine+composite) — one command whose numbers the next
round can diff.

Usage: python tools/profile_stages.py [complexity] [size]
Last line printed is one JSON object: host-side encode group (build /
encode-streams / resolve seconds) + device per-stage incremental ms
(decode, flatten, touches, sort, coverage, composite=frame-coverage).
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
    from vello_tpu.ops.segmented import segment_sum_sorted
    from vello_tpu.pipeline.render import PipelineStatic, render_frame
    from vello_tpu.scenes.test_scenes import filled_mmark

    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    t0 = time.time()
    scene = filled_mmark(complexity, float(size))
    build_s = time.time() - t0
    params = RenderParams(size, size, base_color=(0.1, 0.1, 0.1, 1.0))
    t0 = time.time()
    scene.encoding.packed_streams()
    encode_streams_s = time.time() - t0
    t0 = time.time()
    rs = resolve(scene.encoding, params)
    resolve_s = time.time() - t0
    caps = rs.capacities(params)
    static = PipelineStatic(
        caps_key=caps.key(), width=size, height=size,
        kinds_present=tuple(sorted(set(int(k) for k in rs.paint_kind))))
    bufs = jax.device_put({k: np.asarray(v)
            for k, v in pack_buffers(rs, caps, params).items()})
    WT_alloc = static.width_tiles + 1
    HT = static.height_tiles
    W = float(WT_alloc * TILE_W)

    def upto(stage):
        # Mirrors pipeline.render.prepare_fragments stage-for-stage (rpack,
        # payload sort, Pallas coverage) so the cut points time the REAL path.
        def fn(bufs):
            d = pathtag.decode_and_transform(
                bufs["tags"], bufs["data"], bufs["transforms"],
                bufs["styles"], data4=bufs.get("data4"))
            if stage == "decode":
                return d["points"].sum()
            rects = tiling.tile_alloc(bufs["path_rect"], WT_alloc, HT)
            fl = fo.flatten(d, caps.n_lines, caps.n_edges,
                            W, float(size), rpack=tiling.rect_pack(rects))
            if stage == "flatten":
                return fl["lines"].sum() + fl["edge_lines"].sum()
            lines = jnp.concatenate([fl["lines"], fl["edge_lines"]])
            lpath = jnp.concatenate([fl["line_path"], fl["edge_path"]])
            lrect = jnp.concatenate([fl["line_rect"], fl["edge_rect"]])
            t = tiling.make_touches(lines, lpath, rects, caps.n_touches,
                                    line_rect=lrect)
            if stage == "touches":
                return t["seg"].sum() + t["ftile"].sum()
            seg = t["seg"]
            (f_s, s0, s1, s2, s3, yedge_s, bdval_s) = jax.lax.sort(
                (t["ftile"], seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3],
                 t["y_edge"], t["backdrop_val"]), num_keys=1)
            seg_s = jnp.stack([s0, s1, s2, s3], axis=-1)
            if stage == "sort":
                return f_s.sum() + seg_s.sum()
            from vello_tpu.ops.pallas_kernels import (coverage_cumsum_pallas,
                                                      use_pallas)
            from vello_tpu.ops.segmented import (segment_starts,
                                                 segment_sum_from_starts)
            ids = jnp.clip(f_s, 0, caps.n_path_tiles)
            starts = segment_starts(ids, caps.n_path_tiles)
            if use_pallas():
                csum = coverage_cumsum_pallas(seg_s, yedge_s)
                cpad = jnp.concatenate(
                    [jnp.zeros((1, TILE_H * TILE_W), jnp.float32), csum])
                at = cpad[starts]
                fc = at[1:] - at[:-1]
            else:
                cov = fine_xla.coverage_delta(seg_s, yedge_s)
                fc = segment_sum_from_starts(cov, starts)
            if stage == "coverage":
                return fc.sum()
            raise ValueError(stage)
        return fn

    stages = ["decode", "flatten", "touches", "sort", "coverage"]
    prev = 0.0
    groups = {"encode": {"build_s": round(build_s, 3),
                         "encode_streams_s": round(encode_streams_s, 3),
                         "resolve_s": round(resolve_s, 3)},
              "n_paths": rs.n_paths, "n_segs": rs.n_segs,
              "est_lines": rs.est_lines, "size": size}
    for name in stages:
        j = jax.jit(upto(name))
        r = j(bufs)
        float(jax.device_get(r))
        t0 = time.time()
        for _ in range(5):
            r = j(bufs)
        float(jax.device_get(r))
        dt = (time.time() - t0) / 5
        print(f"{name:10s} cum {dt*1e3:8.2f} ms  (+{(dt-prev)*1e3:8.2f})",
              flush=True)
        groups[name + "_ms"] = round((dt - prev) * 1e3, 2)
        prev = dt
    fj = jax.jit(lambda b: render_frame(b, static)[0].sum())
    r = fj(bufs)
    float(jax.device_get(r))
    t0 = time.time()
    for _ in range(5):
        r = fj(bufs)
    float(jax.device_get(r))
    dt = (time.time() - t0) / 5
    print(f"{'full':10s} cum {dt*1e3:8.2f} ms  (+{(dt-prev)*1e3:8.2f})")
    groups["composite_ms"] = round((dt - prev) * 1e3, 2)
    groups["frame_ms"] = round(dt * 1e3, 2)
    print(json.dumps(groups))


if __name__ == "__main__":
    main()
