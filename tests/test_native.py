"""Native C++ encoder vs Python reference: byte-identical streams."""

import os

import numpy as np
import pytest

from vello_tpu import native
from vello_tpu.scenes import test_scenes


def _streams_with(native_on: bool, scene_fn):
    if native_on:
        os.environ.pop("VELLO_TPU_NO_NATIVE", None)
    else:
        os.environ["VELLO_TPU_NO_NATIVE"] = "1"
    native._lib = None  # reset cache
    try:
        scene = scene_fn(128.0)
        return scene.encoding.packed_streams() + (scene.encoding.n_paths,
                                                  scene.encoding.n_path_segments)
    finally:
        os.environ.pop("VELLO_TPU_NO_NATIVE", None)
        native._lib = None


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("name", ["funky_paths", "fill_types",
                                  "stroke_styles", "splash", "text_scene"])
def test_native_encoder_byte_identical(name):
    fn = test_scenes.DEVICE_SCENES[name]
    t1, d1, tr1, st1, np1, ns1 = _streams_with(True, fn)
    t2, d2, tr2, st2, np2, ns2 = _streams_with(False, fn)
    assert np1 == np2 and ns1 == ns2
    assert np.array_equal(t1, t2), "tag streams differ"
    assert np.array_equal(d1, d2), "data streams differ"
    assert np.array_equal(tr1, tr2)
    assert np.array_equal(st1, st2)


def test_native_encode_speed_smoke():
    if not native.available():
        pytest.skip("no native lib")
    import time

    from vello_tpu.scenes.test_scenes import filled_mmark
    t0 = time.time()
    scene = filled_mmark(2, 512.0)
    dt = time.time() - t0
    assert scene.encoding.n_paths == 2000
    # 2000 paths should encode fast with the native encoder
    assert dt < 5.0


def test_native_estimator_matches_numpy():
    """The C++ capacity estimator must agree with the numpy reference on
    every output (counts AND rects) - it drives tier selection and the
    live-fragment culling bound."""
    import os

    import numpy as np

    import vello_tpu.native as native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    from vello_tpu import RenderParams
    from vello_tpu.encoding.resolve import resolve
    from vello_tpu.scenes.test_scenes import filled_mmark, splash

    for scene, size in [(splash(128.0), 128), (filled_mmark(1, 256.0), 256)]:
        params = RenderParams(size, size)
        rs_n = resolve(scene.encoding, params)
        os.environ["VELLO_TPU_NO_NATIVE"] = "1"
        native._lib = None
        try:
            rs_p = resolve(scene.encoding, params)
        finally:
            del os.environ["VELLO_TPU_NO_NATIVE"]
            native._lib = None
        assert rs_n.est_lines == rs_p.est_lines
        assert rs_n.est_touches == rs_p.est_touches
        assert rs_n.est_path_tiles == rs_p.est_path_tiles
        assert rs_n.est_live == rs_p.est_live
        assert np.array_equal(rs_n.path_rect, rs_p.path_rect)
