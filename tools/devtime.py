"""Device-time measurement through the axon tunnel.

Wall-clock timing of individual jitted calls is useless here: each dispatch
pays ~40 ms of tunnel round-trip, swamping millisecond kernels. This helper
runs a callable N times under jax.profiler.trace and sums the DEVICE events
from trace.json.gz instead (same parsing as tools/trace_frame.py).
"""

import glob
import gzip
import json
import os
from collections import defaultdict


def device_ms(fn, *args, iters=5, tdir="/tmp/vdevtime", per_op=False):
    """Run fn(*args) iters times under the profiler; return mean device ms
    per call (or an {op: ms} dict with per_op=True)."""
    import time

    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    events = []
    for attempt in range(4):
        os.system(f"rm -rf {tdir}")
        try:
            with jax.profiler.trace(tdir):
                for _ in range(iters):
                    out = fn(*args)
                jax.block_until_ready(out)
        except Exception:
            time.sleep(1.0)
            continue
        files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
        if not files:
            time.sleep(1.0)
            continue
        with gzip.open(files[0], "rt") as f:
            tr = json.load(f)
        events = tr["traceEvents"]
        # the tunnel profiler intermittently returns an empty DEVICE track
        # (host events still present); retry until device events appear
        pn = {e["pid"]: e["args"].get("name", "")
              for e in events if e.get("ph") == "M"
              and e.get("name") == "process_name" and "args" in e}
        dp = [p for p, n in pn.items() if "TPU" in n or "/device" in n.lower()]
        if any(e.get("ph") == "X" and e.get("pid") in dp for e in events):
            break
        time.sleep(1.0)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = [p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()]
    per = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            # the whole-program envelope event double-counts its children
            if name.startswith("jit_") or name.startswith("jit("):
                continue
            per[name] += e.get("dur", 0) / 1e3
    if not per:
        import sys
        print("devtime: WARNING no device events captured", file=sys.stderr)
    if per_op:
        return {k: v / iters for k, v in
                sorted(per.items(), key=lambda kv: -kv[1])}
    return sum(per.values()) / iters
