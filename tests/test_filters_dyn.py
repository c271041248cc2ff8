"""Dynamic-parameter filter variants must match the static ones exactly:
the plan-as-data layered compositor keeps filter params as DATA (one
executable per bucketed plan shape even for filtered layers), so the traced
blur/offset/shadow formulations are the static functions with radii/offsets
as traced values (reference treats filters as ordinary layer commands,
``vello_cpu/src/filter/``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from vello_tpu.ops import filters as F


def _img(seed=0, h=40, w=32):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (h, w, 1)).astype(np.float32)
    rgb = rng.uniform(0, 1, (h, w, 3)).astype(np.float32) * a
    return np.concatenate([rgb, a], axis=-1)


@pytest.mark.parametrize("sigma", [0.05, 1.0, 2.7, 6.0])
def test_blur_dyn_matches_static(sigma):
    img = _img(1)
    ref = np.asarray(F.gaussian_blur(np, img.copy(), sigma))
    got = np.asarray(jax.jit(
        lambda im, s: F.gaussian_blur_dyn(jnp, im, s))(img,
                                                       jnp.float32(sigma)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("dx,dy", [(0, 0), (3, -2), (-5, 4), (40, 1)])
def test_offset_dyn_matches_static(dx, dy):
    img = _img(2)
    ref = np.asarray(F.offset_image(np, img.copy(), dx, dy))
    got = np.asarray(jax.jit(
        lambda im, a, b: F.offset_image_dyn(jnp, im, a, b))(
            img, jnp.int32(dx), jnp.int32(dy)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("kind,params", [
    (F.FILTER_NONE, (0.0, 0, 0, 0, 0, 0, 0)),
    (F.FILTER_BLUR, (2.0, 0, 0, 0, 0, 0, 0)),
    (F.FILTER_DROP_SHADOW, (1.5, 4, 3, 0.2, 0.1, 0.0, 0.8)),
    (F.FILTER_OFFSET, (0.0, -3, 6, 0, 0, 0, 0)),
    (F.FILTER_FLOOD, (0.0, 0, 0, 0.3, 0.5, 0.1, 0.9)),
])
def test_apply_filter_dyn_matches_static(kind, params):
    img = _img(3)
    ref = np.asarray(F.apply_filter(np, img.copy(), kind, params)
                     ) * np.ones_like(img)
    got = np.asarray(jax.jit(
        lambda im, k, p: F.apply_filter_dyn(jnp, lax, im, k, p))(
            img, jnp.int32(kind),
            jnp.asarray(params, jnp.float32)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)
