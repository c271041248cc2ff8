#!/usr/bin/env python
"""Headless renderer CLI (reference: examples/headless): render a corpus
scene (or an SVG file) to PNG with either renderer.

Usage:
  python examples/headless.py splash out.png
  python examples/headless.py tiger out.png --size 512 --renderer device
  python examples/headless.py path/to/file.svg out.png --renderer oracle
  python examples/headless.py --list
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", help="scene name or .svg path")
    ap.add_argument("--fit", action="store_true",
                    help="scale an SVG's viewBox to fill the canvas")
    ap.add_argument("out", nargs="?", default="out.png")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--renderer", choices=["device", "oracle"],
                    default="device")
    ap.add_argument("--base-color", default="0.05,0.05,0.05,1")
    ap.add_argument("--cpu", action="store_true",
                    help="force JAX CPU backend")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    from vello_tpu.scenes import test_scenes as ts
    all_scenes = dict(ts.DEVICE_SCENES)
    all_scenes.update(ts.LAYER_SCENES)
    all_scenes["tiger"] = ts.tiger
    all_scenes["mmark"] = ts.mmark
    all_scenes["filled_mmark"] = ts.filled_mmark
    all_scenes["text_heavy"] = ts.text_heavy

    if args.list or not args.scene:
        print("scenes:", ", ".join(sorted(all_scenes)))
        return

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from vello_tpu import RenderParams
    from vello_tpu.utils.png import write_png

    base = tuple(float(v) for v in args.base_color.split(","))
    params = RenderParams(args.size, args.size, base_color=base)

    t0 = time.time()
    if args.scene.endswith(".svg"):
        import xml.etree.ElementTree as ET

        from vello_tpu.kurbo import Affine as A
        from vello_tpu.utils.svg import load_svg
        t = A.IDENTITY
        if args.fit:
            root = ET.parse(args.scene).getroot()
            vb = root.get("viewBox")
            if vb:
                x0, y0, w, h = (float(v) for v in vb.replace(",", " ").split())
            else:
                x0 = y0 = 0.0
                w = float((root.get("width") or "512").rstrip("px"))
                h = float((root.get("height") or "512").rstrip("px"))
            k = args.size / max(w, h)
            t = A.scale(k) @ A.translate(-x0, -y0)
        scene = load_svg(args.scene, transform=t)
    else:
        scene = all_scenes[args.scene](float(args.size))
    t_build = time.time() - t0

    t0 = time.time()
    if args.renderer == "oracle":
        from vello_tpu.oracle import OracleRenderer
        img = OracleRenderer().render(scene, params)
    else:
        from vello_tpu.models.renderer import Renderer
        img = Renderer().render(scene, params)
    t_render = time.time() - t0

    write_png(args.out, img)
    print(f"{args.scene}: {scene.encoding.n_paths} paths, "
          f"{scene.encoding.n_path_segments} segs; build {t_build:.2f}s, "
          f"render {t_render:.2f}s ({args.renderer}) -> {args.out}")


if __name__ == "__main__":
    main()
