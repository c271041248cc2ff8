"""Whole-frame device trace with fusion->HLO attribution.

Jits the REAL bench frame once, dumps that same executable's HLO text, runs a
jax.profiler trace around the steady-state loop, parses trace.json.gz (the
xplane.pb from the axon tunnel has no event metadata), and joins the device
op names with the HLO to name what each expensive fusion computes.

Usage: python tools/trace_frame.py [complexity] [size] [--top N]
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def build(complexity, size, aa="area"):
    import jax
    from vello_tpu import RenderParams
    from vello_tpu.encoding.config import next_size
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.models.renderer import pack_buffers
    from vello_tpu.pipeline.render import PipelineStatic, render_frame
    from vello_tpu.scenes.test_scenes import filled_mmark

    scene = filled_mmark(complexity, float(size))
    params = RenderParams(size, size, base_color=(0.1, 0.1, 0.1, 1.0),
                          antialiasing=aa)
    rs = resolve(scene.encoding, params)
    caps = rs.capacities(params)
    n_live = min(caps.n_path_tiles,
                 next_size(rs.est_live + 64 + rs.n_paths // 16, align=128))
    static = PipelineStatic(
        caps_key=caps.key(), width=size, height=size,
        kinds_present=tuple(sorted(set(int(k) for k in rs.paint_kind))),
        aa=aa,
        has_evenodd=(bool((rs.fill_rule == 1).any())
                     if aa.startswith("msaa") else True),
        n_live=0 if n_live >= caps.n_path_tiles else n_live,
        has_edge=bool(getattr(rs, 'has_left_edge', True)))
    from vello_tpu.pipeline.render import wants_fused_geom
    _slim = wants_fused_geom(caps)
    _paint8 = _slim and set(static.kinds_present) <= {0}
    bufs = jax.device_put({k: np.asarray(v)
            for k, v in pack_buffers(rs, caps, params, slim=_slim,
                                     paint8=_paint8).items()})
    from functools import partial
    fn = jax.jit(partial(render_frame, static=static))
    return fn, bufs


def hlo_index(hlo_text):
    """op name -> its HLO definition line (root line of fusions)."""
    idx = {}
    fusion_bodies = {}
    cur_comp = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(%?[\w.\-]+)\s*=\s*(.*)", line)
        if line.startswith("%fused_computation") or \
                re.match(r"%?fused_\w+", line.strip()):
            pass
        if m:
            name = m.group(1).lstrip("%")
            idx[name] = m.group(2)[:400]
    return idx, fusion_bodies


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    complexity = int(args[0]) if len(args) > 0 else 10
    size = int(args[1]) if len(args) > 1 else 1024
    aa = args[2] if len(args) > 2 else "area"
    top = 25
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=")[1]) if "=" in a else 25

    import jax
    fn, bufs = build(complexity, size, aa)
    lowered = fn.lower(bufs)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    os.makedirs("/tmp/vtrace", exist_ok=True)
    with open("/tmp/vtrace/frame.hlo", "w") as f:
        f.write(hlo_text)
    idx, _ = hlo_index(hlo_text)

    # warm
    img, ov = compiled(bufs)
    int(jax.device_get(ov))
    tdir = "/tmp/vtrace/prof"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(5):
            img, ov = compiled(bufs)
        int(jax.device_get(ov))

    # parse trace.json.gz
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace files under {tdir}"
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # find device pid
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = [p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()]
    per_op = defaultdict(float)
    per_op_count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_op[name] += dur
        per_op_count[name] += 1
        total += dur

    n_frames = 5
    print(f"== device total {total/n_frames:.2f} ms/frame "
          f"(complexity={complexity}, size={size}, aa={aa}) ==")
    # family rollup
    fam = defaultdict(float)
    for name, d in per_op.items():
        base = re.sub(r"[.\d]+$", "", name)
        fam[base] += d
    print("-- families --")
    for name, d in sorted(fam.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {d/n_frames:7.3f} ms  {name}")
    print(f"-- top {top} ops --")
    for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        h = idx.get(name, "")
        # shorten shapes
        h = re.sub(r"f32|s32|u32|pred", lambda m: m.group(0), h)
        print(f"  {d/n_frames:7.3f} ms x{per_op_count[name]//n_frames:<3d}"
              f" {name}\n      {h[:260]}")


if __name__ == "__main__":
    main()
