#!/usr/bin/env python
"""Micro/integration benchmark suite (the reference's vello_bench role:
criterion groups over flatten / tile / sort / coverage / composite plus
whole-scene integration runs).

Usage: python tools/microbench.py [--scenes] [--stages] [--size N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def sync(x):
    import jax
    import jax.numpy as jnp
    return float(jax.device_get(jnp.asarray(x).sum()))


def bench_scenes(size):
    import jax

    from vello_tpu import RenderParams
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.models.renderer import Renderer
    from vello_tpu.scenes import test_scenes as ts

    names = dict(ts.DEVICE_SCENES)
    names.update(ts.LAYER_SCENES)
    names["tiger"] = ts.tiger
    r = Renderer()
    params = RenderParams(size, size, base_color=(0.05, 0.05, 0.05, 1.0))
    out = {}
    for name, fn in sorted(names.items()):
        try:
            scene = fn(float(size))
        except FileNotFoundError:
            continue
        r.render(scene, params)  # compile + warm
        t0 = time.time()
        n = 5
        for _ in range(n):
            img = r.render(scene, params)
        dt = (time.time() - t0) / n
        out[name] = round(dt * 1e3, 2)
        print(f"{name:18s} {dt*1e3:8.2f} ms  "
              f"({scene.encoding.n_paths} paths)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    res = bench_scenes(args.size)
    if args.json:
        print(json.dumps(res))


if __name__ == "__main__":
    main()
