"""Standalone multi-device sharded-render check, run as a subprocess by
test_parallel.py when the parent pytest process couldn't get 8 virtual
devices (XLA_FLAGS must be set before the interpreter starts in this image).

Exit code 0 = sharded render matches single-device render.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from vello_tpu import Affine, Fill, RenderParams
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.kurbo import circle_path, rect_path
    from vello_tpu.models.renderer import Renderer, pack_buffers
    from vello_tpu.parallel.mesh import make_mesh, render_batch
    from vello_tpu.peniko import palette
    from vello_tpu.pipeline.render import PipelineStatic
    from vello_tpu.scene import Scene

    size = 128
    params = RenderParams(size, size, base_color=(0, 0, 0, 1))
    scenes = []
    for i in range(4):
        s = Scene()
        s.fill(Fill.NON_ZERO, Affine.identity(), palette.RED, None,
               circle_path(40 + 10 * i, 64, 30))
        s.fill(Fill.NON_ZERO, Affine.identity(),
               palette.BLUE.with_alpha(0.6), None,
               rect_path(20, 20 + 8 * i, 100, 60 + 8 * i))
        scenes.append(s)
    resolved = [resolve(s.encoding, params) for s in scenes]
    caps = resolved[0].capacities(params)
    static = PipelineStatic(caps_key=caps.key(), width=size, height=size,
                            kinds_present=(0,))
    bufs = [pack_buffers(r, caps, params) for r in resolved]
    mesh = make_mesh(2, 4)
    imgs, overflow = render_batch(bufs, static, mesh)
    assert overflow.sum() == 0
    assert imgs.shape == (4, 128, 128, 4)
    single = Renderer()
    for i, r in enumerate(resolved):
        ref = single.render_resolved(r, params)
        d = np.abs(imgs[i, :128, :128] - ref)
        assert d.max() < 1e-4, f"scene {i}: max {d.max()}"
    print("parallel_check OK")


if __name__ == "__main__":
    main()
