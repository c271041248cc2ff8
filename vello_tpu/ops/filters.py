"""Layer filters: gaussian blur (3-pass box approximation), drop shadow,
offset, flood — the sparse-strips filter suite
(``vello_common/src/filter*.rs`` + ``vello_cpu/src/filter/``; the blur is
the same 3-box construction as ``vello_cpu/src/filter/gaussian_blur.rs``).

xp-agnostic; box blur is cumsum-based (two prefix sums + a difference per
axis), which is the TPU-native formulation of a separable convolution.
Inputs are premultiplied (H, W, 4) images; filters run on whole layer
buffers at pop time.
"""

from __future__ import annotations

import math


def boxes_for_gauss(sigma: float, n: int = 3):
    """W3C/standard box sizes approximating a gaussian with n boxes."""
    w_ideal = math.sqrt((12.0 * sigma * sigma / n) + 1.0)
    wl = int(math.floor(w_ideal))
    if wl % 2 == 0:
        wl -= 1
    wu = wl + 2
    m_ideal = ((12.0 * sigma * sigma - n * wl * wl - 4.0 * n * wl - 3.0 * n)
               / (-4.0 * wl - 4.0))
    m = int(round(m_ideal))
    return [wl if i < m else wu for i in range(n)]


def box_blur_axis(xp, img, radius: int, axis: int):
    """Box blur of width 2*radius+1 along axis, edge-extended, via cumsum."""
    if radius <= 0:
        return img
    n = img.shape[axis]
    c = xp.cumsum(img, axis=axis)

    def take(idx):
        idx = xp.clip(idx, 0, n - 1)
        return xp.take(c, idx, axis=axis)

    ar = xp.arange(n)
    hi = take(ar + radius)
    lo = take(ar - radius - 1)
    lo = xp.where(
        xp.reshape(ar - radius - 1 < 0,
                   [n if a == axis else 1 for a in range(img.ndim)]),
        0.0, lo)
    # edge extension: count of off-edge samples replaced by edge value
    first = xp.take(img, xp.asarray([0]), axis=axis)
    last = xp.take(img, xp.asarray([n - 1]), axis=axis)
    n_lo = xp.reshape(xp.maximum(radius - ar, 0),
                      [n if a == axis else 1 for a in range(img.ndim)])
    n_hi = xp.reshape(xp.maximum(ar + radius - (n - 1), 0),
                      [n if a == axis else 1 for a in range(img.ndim)])
    total = hi - lo + n_lo * first + n_hi * last
    return total / (2.0 * radius + 1.0)


def gaussian_blur(xp, img, sigma: float):
    """3-box gaussian approximation (separable)."""
    if sigma <= 0.1:
        return img
    for w in boxes_for_gauss(sigma):
        r = (w - 1) // 2
        img = box_blur_axis(xp, img, r, 0)
        img = box_blur_axis(xp, img, r, 1)
    return img


def offset_image(xp, img, dx: int, dy: int):
    """Shift by integer pixels, zero-filled."""
    h, w = img.shape[0], img.shape[1]
    out = xp.roll(xp.roll(img, dy, axis=0), dx, axis=1)
    ys = xp.reshape(xp.arange(h), (h, 1, 1))
    xs = xp.reshape(xp.arange(w), (1, w, 1))
    mask = xp.ones_like(out)
    if dy > 0:
        mask = xp.where(ys < dy, 0.0, mask)
    elif dy < 0:
        mask = xp.where(ys >= h + dy, 0.0, mask)
    if dx > 0:
        mask = xp.where(xs < dx, 0.0, mask)
    elif dx < 0:
        mask = xp.where(xs >= w + dx, 0.0, mask)
    return out * mask


def drop_shadow(xp, img, dx: int, dy: int, sigma: float, color):
    """Shadow = blurred+offset alpha tinted by color, composited UNDER the
    content (filter_drop_shadow role)."""
    alpha = img[..., 3:4]
    sh_a = offset_image(xp, gaussian_blur(xp, alpha, sigma), dx, dy)
    shadow = xp.concatenate([
        color[0] * color[3] * sh_a, color[1] * color[3] * sh_a,
        color[2] * color[3] * sh_a, color[3] * sh_a], axis=-1)
    # content over shadow
    return img + shadow * (1.0 - img[..., 3:4])


def flood(xp, img, color):
    """Fill the whole layer with a color (clip applies at composite)."""
    out = xp.ones_like(img)
    return out * xp.asarray([color[0] * color[3], color[1] * color[3],
                             color[2] * color[3], color[3]])


# filter kinds for the layer plan
FILTER_NONE = 0
FILTER_BLUR = 1
FILTER_DROP_SHADOW = 2
FILTER_OFFSET = 3
FILTER_FLOOD = 4


# ---------------------------------------------------------------------------
# Dynamic-parameter variants (params are TRACED values, not Python floats):
# the plan-as-data layered compositor keeps filter kind+params in the op
# table, so one executable serves every filtered layer structure — the op
# STRUCTURE is fixed (3 box passes per axis, roll+mask, ...), only radii /
# offsets / colors are data. (Replaces the unrolled-pipeline fallback that
# recompiled per layer structure; reference treats filters as ordinary
# per-layer commands, vello_cpu/src/filter/.)

def _box_blur_axis_dyn(jnp, img, radius, axis: int):
    """Box blur with a TRACED integer radius (0 = exact identity)."""
    n = img.shape[axis]
    c = jnp.cumsum(img, axis=axis)
    shape1 = [n if a == axis else 1 for a in range(img.ndim)]

    def take(idx):
        return jnp.take(c, jnp.clip(idx, 0, n - 1), axis=axis)

    ar = jnp.arange(n)
    hi = take(ar + radius)
    lo = take(ar - radius - 1)
    lo = jnp.where(jnp.reshape(ar - radius - 1 < 0, shape1), 0.0, lo)
    first = jnp.take(img, jnp.asarray([0]), axis=axis)
    last = jnp.take(img, jnp.asarray([n - 1]), axis=axis)
    n_lo = jnp.reshape(jnp.maximum(radius - ar, 0), shape1)
    n_hi = jnp.reshape(jnp.maximum(ar + radius - (n - 1), 0), shape1)
    total = hi - lo + n_lo * first + n_hi * last
    return total / (2.0 * radius + 1.0)


def _box_radii_dyn(jnp, sigma):
    """Traced 3-box radii for a gaussian of traced sigma (W3C sizes)."""
    nf = 3.0
    w_ideal = jnp.sqrt((12.0 * sigma * sigma / nf) + 1.0)
    wl = jnp.floor(w_ideal)
    wl = wl - jnp.where(jnp.mod(wl, 2.0) == 0.0, 1.0, 0.0)
    wl = jnp.maximum(wl, 1.0)
    wu = wl + 2.0
    m = jnp.round((12.0 * sigma * sigma - nf * wl * wl - 4.0 * nf * wl
                   - 3.0 * nf) / (-4.0 * wl - 4.0))
    rl = ((wl - 1.0) / 2.0).astype(jnp.int32)
    ru = ((wu - 1.0) / 2.0).astype(jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    radii = []
    for i in range(3):
        r = jnp.where(i < m, rl, ru)
        radii.append(jnp.where(sigma <= 0.1, zero, r))
    return radii


def gaussian_blur_dyn(jnp, img, sigma):
    """3-box gaussian with traced sigma (radius 0 passes are identity)."""
    for r in _box_radii_dyn(jnp, sigma):
        img = _box_blur_axis_dyn(jnp, img, r, 0)
        img = _box_blur_axis_dyn(jnp, img, r, 1)
    return img


def offset_image_dyn(jnp, img, dx, dy):
    """Integer-pixel shift with traced offsets, zero-filled."""
    h, w = img.shape[0], img.shape[1]
    out = jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
    ys = jnp.reshape(jnp.arange(h), (h, 1, 1))
    xs = jnp.reshape(jnp.arange(w), (1, w, 1))
    keep_y = (ys >= jnp.maximum(dy, 0)) & (ys < h + jnp.minimum(dy, 0))
    keep_x = (xs >= jnp.maximum(dx, 0)) & (xs < w + jnp.minimum(dx, 0))
    return jnp.where(keep_y & keep_x, out, 0.0)


def apply_filter_dyn(jnp, lax, img, kind, params):
    """img (H, W, 4) premultiplied; kind traced i32; params (7,) traced
    [sigma, dx, dy, r, g, b, a]. One lax.switch — all branches have the
    same static shape, only data varies."""
    sigma = params[0]
    dx = params[1].astype(jnp.int32)
    dy = params[2].astype(jnp.int32)
    col = params[3:7]

    def f_none(im):
        return im

    def f_blur(im):
        return gaussian_blur_dyn(jnp, im, sigma)

    def f_shadow(im):
        sh_a = offset_image_dyn(
            jnp, gaussian_blur_dyn(jnp, im[..., 3:4], sigma), dx, dy)
        shadow = jnp.concatenate(
            [col[0] * col[3] * sh_a, col[1] * col[3] * sh_a,
             col[2] * col[3] * sh_a, col[3] * sh_a], axis=-1)
        return im + shadow * (1.0 - im[..., 3:4])

    def f_offset(im):
        return offset_image_dyn(jnp, im, dx, dy)

    def f_flood(im):
        fill = jnp.stack([col[0] * col[3], col[1] * col[3],
                          col[2] * col[3], col[3]])
        return jnp.broadcast_to(fill, im.shape)

    return lax.switch(jnp.clip(kind, 0, 4),
                      [f_none, f_blur, f_shadow, f_offset, f_flood], img)


def apply_filter(xp, img, kind: int, params):
    """img: (H, W, 4) premultiplied. params: (sigma, dx, dy, r, g, b, a)."""
    sigma, dx, dy = params[0], int(params[1]), int(params[2])
    color = params[3:7]
    if kind == FILTER_BLUR:
        return gaussian_blur(xp, img, sigma)
    if kind == FILTER_DROP_SHADOW:
        return drop_shadow(xp, img, dx, dy, sigma, color)
    if kind == FILTER_OFFSET:
        return offset_image(xp, img, dx, dy)
    if kind == FILTER_FLOOD:
        return flood(xp, img, color)
    return img
