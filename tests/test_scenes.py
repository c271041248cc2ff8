"""Scene-corpus differential tests: device vs oracle on every device-safe
corpus scene, plus oracle-only runs of the layered scenes (crash-coverage +
snapshot hashes)."""

import numpy as np
import pytest

from vello_tpu import RenderParams
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle import OracleRenderer
from vello_tpu.scenes.test_scenes import DEVICE_SCENES, LAYER_SCENES

PARAMS = RenderParams(128, 128, base_color=(0.05, 0.05, 0.05, 1.0))


@pytest.mark.parametrize("name", sorted(DEVICE_SCENES))
def test_device_scene_matches_oracle(name):
    scene = DEVICE_SCENES[name](128.0)
    a = OracleRenderer().render(scene, PARAMS)
    b = Renderer().render(scene, PARAMS)
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    assert d.mean() < 1e-3, f"{name}: mean {d.mean()}"
    assert d.max() < 0.06, f"{name}: max {d.max()}"


@pytest.mark.parametrize("name", sorted(LAYER_SCENES))
def test_layer_scene_oracle_runs(name):
    scene = LAYER_SCENES[name](128.0)
    img = OracleRenderer().render(scene, PARAMS)
    assert img.shape == (128, 128, 4)
    assert np.isfinite(img).all()
    # layered scenes must actually draw something
    assert img[..., :3].std() > 0.01
