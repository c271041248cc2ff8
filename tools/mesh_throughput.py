"""dp-batch throughput on a virtual CPU mesh — cost-model sanity for the
multi-chip serving path (NOT an fps claim; CPU absolute numbers are
meaningless, the SCALING ratio is the signal).

Measures scenes/s through MeshRenderer at dp=N vs a dp=1 mesh of the same
compiled program, on 8 virtual CPU devices. The virtual devices SHARE the
physical cores, so ideal dp throughput here is FLAT (dp_efficiency = 1.0:
N scenes take N times one scene's wall clock); real chips would multiply
it by N. dp_efficiency < 1 measures the sharding overhead the mesh adds
(replicated work, cross-shard serialization, stacking). Reference analog:
the MT dispatcher's cost batching
(sparse_strips/vello_cpu/src/dispatch/multi_threaded.rs:57-116).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/mesh_throughput.py [complexity] [size]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize preloads jaxlib, which captures XLA_FLAGS before this file
# runs — re-exec once with the flag in the environment (conftest.py has the
# same dance).
_FLAG = "--xla_force_host_platform_device_count=8"
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", "") \
        and not os.environ.get("_MESH_TP_REEXEC"):
    env = dict(os.environ,
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") + " " + _FLAG)
               .strip(),
               JAX_PLATFORMS="cpu", _MESH_TP_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import jax

    # force the CPU backend even when the axon TPU plugin registered
    # itself (same dance as tests/conftest.py — a wedged tunnel must not
    # hang this tool, and the virtual 8-device mesh lives on CPU)
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
    import numpy as np

    from vello_tpu import RenderParams
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.parallel.mesh import MeshRenderer, make_mesh
    from vello_tpu.scenes.test_scenes import filled_mmark

    n_dev = len(jax.devices())
    params = RenderParams(size, size, base_color=(0, 0, 0, 1))
    # distinct seeds: dp shards must not share anything
    resolved = [resolve(filled_mmark(complexity, float(size),
                                     seed=i + 1).encoding, params)
                for i in range(n_dev)]

    out = {"n_devices": n_dev, "complexity": complexity, "size": size}
    for n_dp in (1, n_dev):
        mr = MeshRenderer(make_mesh(n_dp, 1, jax.devices()[:n_dp]))
        batch = resolved[:n_dp]
        imgs = mr.render_batch(batch, params)       # compile + check
        assert imgs.shape[0] == n_dp
        iters = max(12 // n_dp, 3)
        t0 = time.time()
        for _ in range(iters):
            mr.render_batch(batch, params)
        dt = time.time() - t0
        out[f"dp{n_dp}_scenes_per_s"] = round(n_dp * iters / dt, 2)
    out["dp_efficiency"] = round(
        out[f"dp{n_dev}_scenes_per_s"] / out["dp1_scenes_per_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
