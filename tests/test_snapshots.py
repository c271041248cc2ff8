"""Golden-PNG snapshot tests: every corpus scene, rendered by BOTH the oracle
and the device pipeline, against one shared golden per scene (the reference's
multi-renderer single-golden model, vello_sparse_tests).

Regenerate: VELLO_TEST_UPDATE=1 python -m pytest tests/test_snapshots.py
"""

import numpy as np
import pytest

from vello_tpu import RenderParams
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle import OracleRenderer
from vello_tpu.scenes.test_scenes import DEVICE_SCENES, LAYER_SCENES

from snapshot import assert_snapshot

PARAMS = RenderParams(128, 128, base_color=(0.05, 0.05, 0.05, 1.0))
ALL = {**DEVICE_SCENES, **LAYER_SCENES}

# max-gate opt-outs (shared golden, default 4/255): the oracle is an
# INDEPENDENT scanline-accumulation algorithm, and on these scenes its AA
# boundary coverage differs from the device's area formulation by up to
# 7/255 on a handful of glyph/edge pixels (measured; device==golden to
# <= 3/255 on both). The mean gate (0.001) still binds tightly.
ORACLE_MAX_TOL = {"many_draw_objects": 0.035, "text_scene": 0.035}


@pytest.mark.parametrize("name", sorted(ALL))
def test_snapshot_oracle(name):
    img = OracleRenderer().render(ALL[name](128.0), PARAMS)
    assert_snapshot(name, img, mean_tol=0.001,
                    max_tol=ORACLE_MAX_TOL.get(name))


@pytest.mark.parametrize("name", sorted(ALL))
def test_snapshot_device(name):
    img = Renderer().render(ALL[name](128.0), PARAMS)
    assert_snapshot(name, img, mean_tol=0.002)
