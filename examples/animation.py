"""Animated frame loop / serving demo: re-render a scene with a moving
transform, reusing the Renderer's device-buffer cache and rgba8 readback.

Role of the reference's `examples/with_winit` frame loop (SURVEY.md §1 L7)
minus the window: prints per-frame latency, writes the last frame.

Usage: python examples/animation.py [n_frames] [size]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.kurbo import circle_path, star_path
from vello_tpu.models.renderer import Renderer
from vello_tpu.peniko import Color, Extend, Gradient, palette, stops
from vello_tpu.utils.png import write_png


def make_scene(t: float) -> Scene:
    s = Scene()
    g = Gradient.linear((0, 0), (256, 256),
                        stops(palette.REBECCA_PURPLE, palette.GOLD)
                        if hasattr(palette, "REBECCA_PURPLE") else
                        stops(palette.BLUE, palette.YELLOW), Extend.PAD)
    s.fill(Fill.NON_ZERO, Affine.identity(), g, None,
           circle_path(128, 128, 120))
    s.fill(Fill.EVEN_ODD, Affine.rotate_about(t, 128, 128),
           Color(0.9, 0.25, 0.2, 0.85), None,
           star_path(128, 128, 7, 40, 105))
    return s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    r = Renderer()
    params = RenderParams(size, size, base_color=(0.08, 0.08, 0.12, 1.0))
    r.render(make_scene(0.0), params)          # warm compile
    times = []
    img = None
    for k in range(n):
        t0 = time.perf_counter()
        img = r.render_u8(make_scene(k * 0.21), params)
        times.append(time.perf_counter() - t0)
    write_png("/tmp/animation_last.png", img)
    ms = np.asarray(times) * 1e3
    print(f"{n} frames @ {size}^2: median {np.median(ms):.1f} ms "
          f"({1e3 / np.median(ms):.1f} fps), p90 {np.percentile(ms, 90):.1f} ms"
          f" -> /tmp/animation_last.png")


if __name__ == "__main__":
    main()
