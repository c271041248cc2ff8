"""Blurred rounded-rect suite ported from the reference sparse corpus
(``vello_sparse_tests/tests/blurred_rounded_rect.rs``): std-dev sweep
(0, 0.1, 5, 10, 20), corner radii (0, 10, 30), a rotated instance, and the
``inverse`` (inset-shadow) variants. Device output diffs against the
scanline oracle (same erf-integration coverage function, independently
driven) and own goldens."""

import math

import numpy as np
import pytest

from snapshot import assert_snapshot
from vello_tpu import Affine, RenderParams, Scene
from vello_tpu.kurbo import Rect
from vello_tpu.models.renderer import Renderer
from vello_tpu.oracle.renderer import OracleRenderer
from vello_tpu.peniko import palette

RECT = Rect(20.0, 20.0, 80.0, 80.0)


def _scene(radius, std_dev, transform=None, inverse=False):
    s = Scene()
    s.draw_blurred_rounded_rect(transform or Affine.identity(), RECT,
                                palette.REBECCA_PURPLE, radius, std_dev,
                                inverse=inverse)
    return s


def _check(name, scene, mean_tol=0.004, max_tol=None):
    params = RenderParams(100, 100, base_color=(0, 0, 0, 0))
    dev = Renderer().render(scene, params)
    orc = OracleRenderer().render(scene, params)
    assert np.abs(dev - orc).mean() < mean_tol, \
        f"{name}: device vs oracle {np.abs(dev - orc).mean():.5f}"
    assert_snapshot(name, dev, mean_tol=0.004, max_tol=max_tol)
    return dev


@pytest.mark.parametrize("name,radius,std", [
    ("blurred_rrect_zero", 0.0, 0.0),
    ("blurred_rrect_zero_with_radius", 10.0, 0.0),
    ("blurred_rrect_none", 0.0, 0.1),
    ("blurred_rrect_small_std", 0.0, 5.0),
    ("blurred_rrect_medium_std", 0.0, 10.0),
    ("blurred_rrect_large_std", 0.0, 20.0),
    ("blurred_rrect_with_radius", 10.0, 10.0),
    ("blurred_rrect_large_radius", 30.0, 10.0),
])
def test_blurred_rounded_rect(name, radius, std):
    dev = _check(name, _scene(radius, std))
    # center is inside the rect: near-full purple alpha for small blur
    if std <= 5.0:
        assert float(dev[50, 50, 3]) > 0.95
    # corner pixel (2,2) is ~24.7 px from the rect corner: empty unless
    # the gaussian tail reaches it (std 20 leaves ~0.036 coverage there)
    if 2.5 * std < 17.0:
        assert float(np.abs(dev[2, 2]).max()) < 0.02


def test_blurred_rounded_rect_with_transform():
    t = Affine.rotate_about(math.radians(45.0), 50.0, 50.0)
    _check("blurred_rrect_rotated", _scene(10.0, 10.0, transform=t))


@pytest.mark.parametrize("name,radius,std", [
    ("inverse_blurred_rrect_small_std", 0.0, 5.0),
    ("inverse_blurred_rrect_medium_std", 0.0, 10.0),
    ("inverse_blurred_rrect_large_std", 0.0, 20.0),
    ("inverse_blurred_rrect_with_radius", 10.0, 10.0),
    ("inverse_blurred_rrect_large_radius", 30.0, 10.0),
])
def test_inverse_blurred_rounded_rect(name, radius, std):
    dev = _check(name, _scene(radius, std, inverse=True))
    # inset shadow: transparent deep inside (at std 20 the rect half-size
    # is only 1.5 sigma, leaving ~0.25 inverse coverage at the center)
    if std <= 10.0:
        assert float(dev[50, 50, 3]) < 0.1
    if 2.5 * std >= 18.0:            # inflated region reaches the corner
        assert float(dev[2, 2, 3]) > 0.5


def test_inverse_blurred_rounded_rect_with_transform():
    t = Affine.rotate_about(math.radians(45.0), 50.0, 50.0)
    _check("inverse_blurred_rrect_rotated",
           _scene(10.0, 10.0, transform=t, inverse=True))
