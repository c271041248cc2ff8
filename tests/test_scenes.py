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
