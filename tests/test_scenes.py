"""Scene-corpus differential tests: device vs oracle on every corpus scene
(including clip/blend-layered scenes via the layered compositor)."""

import numpy as np
import pytest

from vello_tpu import RenderParams
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle import OracleRenderer
from vello_tpu.scenes.test_scenes import DEVICE_SCENES, LAYER_SCENES

PARAMS = RenderParams(128, 128, base_color=(0.05, 0.05, 0.05, 1.0))

ALL_SCENES = {**DEVICE_SCENES, **LAYER_SCENES}


@pytest.mark.parametrize("name", sorted(ALL_SCENES))
def test_scene_device_matches_oracle(name):
    scene = ALL_SCENES[name](128.0)
    a = OracleRenderer().render(scene, PARAMS)
    b = Renderer().render(scene, PARAMS)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert d.mean() < 1e-3, f"{name}: mean {d.mean()}"
    assert d.max() < 0.06, f"{name}: max {d.max()}"
    # the scene must actually draw something
    assert b[..., :3].std() > 0.01


def test_tiger_device_matches_oracle():
    import os

    from vello_tpu.scenes.test_scenes import TIGER_ASSET, tiger
    if not os.path.exists(TIGER_ASSET):
        pytest.skip("tiger asset not mounted")
    params = RenderParams(192, 192, base_color=(1, 1, 1, 1))
    scene = tiger(192.0)
    a = OracleRenderer().render(scene, params)
    b = Renderer().render(scene, params)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert d.mean() < 2e-4 and d.max() < 0.06


def test_gs_tiger_renders():
    """The reference's Ghostscript tiger through the SVG loader + device
    pipeline (BASELINE.md milestone config)."""
    import os

    import numpy as np

    from vello_tpu import RenderParams
    from vello_tpu.models.renderer import Renderer
    from vello_tpu.oracle import OracleRenderer
    from vello_tpu.scenes.test_scenes import tiger

    try:
        s = tiger(128.0)
    except FileNotFoundError:
        import pytest
        pytest.skip("reference tiger asset unavailable")
    params = RenderParams(128, 128, base_color=(1, 1, 1, 1))
    dev = Renderer().render(s, params)
    orc = OracleRenderer().render(s, params)
    assert np.abs(dev - orc).mean() < 2.5e-3
    from snapshot import assert_snapshot
    assert_snapshot("gs_tiger", dev, mean_tol=0.002)
