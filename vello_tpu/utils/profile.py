"""In-frame per-stage device profiling.

The pipeline stages are wrapped in ``jax.named_scope("sNN_stage")``; XLA
carries the scope into each HLO op's ``op_name`` metadata, which survives
fusion. One profiler trace of the REAL jitted frame is parsed and device
op durations are aggregated by stage — unlike re-jitting stage prefixes
(whose fusion decisions differ), this attributes the actual executable's
time. The role of the reference's per-dispatch timer queries
(``vello/src/wgpu_engine.rs:396,572-575`` surfaced via
``Renderer.profile_result``, ``lib.rs:337-344``).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from collections import defaultdict

_SCOPE_RE = re.compile(r"op_name=\"[^\"]*?(s\d\d_\w+)")
_DEF_RE = re.compile(r"\s*(%?[\w.\-]+)\s*=\s*")


def _op_scopes(hlo_text: str) -> dict:
    """HLO op name -> stage scope (from op_name metadata; fusions keep the
    scope of their root op)."""
    scopes = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        s = _SCOPE_RE.search(line)
        if s:
            scopes[m.group(1).lstrip("%")] = s.group(1)
    return scopes


def profile_stages(compiled, args, iters: int = 3) -> dict:
    """Run ``compiled(args)`` under a profiler trace and return
    {stage: device_ms_per_frame} (+ "_total" and "_other")."""
    import jax

    scopes = _op_scopes(compiled.as_text())
    tdir = tempfile.mkdtemp(prefix="vtpu_prof_")
    try:
        out = compiled(args)
        jax.block_until_ready(out)
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                out = compiled(args)
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                          recursive=True)
        if not files:
            return {}
        with gzip.open(files[0], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        pid_names = {e["pid"]: e["args"].get("name", "")
                     for e in events if e.get("ph") == "M"
                     and e.get("name") == "process_name" and "args" in e}
        dev_pids = [p for p, n in pid_names.items()
                    if "TPU" in n or "/device" in n.lower()]
        per_stage = defaultdict(float)
        total = 0.0
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "")
            dur = e.get("dur", 0) / 1e3
            # skip whole-call envelope events
            if name.startswith("jit_") or name.startswith("jit("):
                continue
            stage = scopes.get(name, "_other")
            per_stage[stage] += dur
            total += dur
        if total == 0.0:
            return {}
        out = {k: round(v / iters, 3) for k, v in
               sorted(per_stage.items())}
        out["_total"] = round(total / iters, 3)
        return out
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
