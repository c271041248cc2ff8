"""Regenerate docs/gallery PNGs on the attached device.

Usage: python tools/make_gallery.py [scene ...]   (default: new scenes)
"""
import sys

sys.path.insert(0, ".")


def main():
    from vello_tpu import RenderParams
    from vello_tpu.models.renderer import Renderer
    from vello_tpu.scenes import test_scenes as ts
    from vello_tpu.utils.png import write_png

    names = sys.argv[1:] or ["filter_suite"]
    r = Renderer()
    for name in names:
        scene = getattr(ts, name)()
        size = 512 if name != "filter_suite" else 256
        img = r.render_u8(scene, RenderParams(size, size,
                                              base_color=(1, 1, 1, 1)))
        out = f"docs/gallery/{name}.png"
        write_png(out, img)
        print("wrote", out)


if __name__ == "__main__":
    main()
