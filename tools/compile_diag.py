"""Diagnose cold-compile time: trace + compile each half of the split
pipeline separately (AOT), with the persistent cache DISABLED, at the bench
tier. Usage: python tools/compile_diag.py [complexity] [size]
"""

import os
import sys
import time

os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from vello_tpu import RenderParams
    from vello_tpu.encoding.config import next_size
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.models.renderer import pack_buffers
    from vello_tpu.pipeline.render import (PipelineStatic, composite_frame,
                                           prepare_fragments,
                                           wants_fused_geom, _SPLIT_META)
    from vello_tpu.scenes.test_scenes import filled_mmark
    from functools import partial

    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1600

    jax.devices()
    scene = filled_mmark(complexity, float(size))
    params = RenderParams(size, size, base_color=(0.1, 0.1, 0.1, 1.0),
                          antialiasing="msaa16")
    rs = resolve(scene.encoding, params)
    caps = rs.capacities(params)
    n_live = min(caps.n_path_tiles,
                 next_size(rs.est_live + 64 + rs.n_paths // 16, align=128))
    static = PipelineStatic(
        caps_key=caps.key(), width=size, height=size,
        kinds_present=tuple(sorted(set(int(k) for k in rs.paint_kind))),
        aa="msaa16", has_evenodd=False,
        n_live=0 if n_live >= caps.n_path_tiles else n_live)
    slim = wants_fused_geom(caps)
    paint8 = slim and set(static.kinds_present) <= {0}
    bufs = pack_buffers(rs, caps, params, slim=slim, paint8=paint8)
    bufs = jax.device_put({k: np.asarray(v) for k, v in bufs.items()})

    fa = jax.jit(partial(prepare_fragments, static=static))
    t0 = time.time()
    lowered = fa.lower(bufs)
    t_trace_a = time.time() - t0
    print(f"geometry trace: {t_trace_a:.1f}s", flush=True)
    t0 = time.time()
    ca = lowered.compile()
    t_comp_a = time.time() - t0
    print(f"geometry compile: {t_comp_a:.1f}s", flush=True)

    fr = ca(bufs)
    fr = {k: v for k, v in fr.items() if k not in _SPLIT_META}
    fb = jax.jit(partial(composite_frame, width=size, height=size,
                         lowp=False, u8_out=True))
    t0 = time.time()
    lb = fb.lower(fr, bufs["base_color"])
    t_trace_b = time.time() - t0
    print(f"composite trace: {t_trace_b:.1f}s", flush=True)
    t0 = time.time()
    cb = lb.compile()
    t_comp_b = time.time() - t0
    print(f"composite compile: {t_comp_b:.1f}s", flush=True)
    total = t_trace_a + t_comp_a + t_trace_b + t_comp_b
    print(f"TOTAL trace+compile: {total:.1f}s", flush=True)


if __name__ == "__main__":
    main()
