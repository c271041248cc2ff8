"""Residency / eviction behavior of the image atlas and glyph caches
(reference: image_cache.rs generation eviction, glifo cache maintenance)."""

import numpy as np
import pytest

from vello_tpu import Affine, Fill, RenderParams, Scene
from vello_tpu.encoding.resolve import ImageAtlas, Resolver
from vello_tpu.models.renderer import Renderer
from vello_tpu.peniko import Extend, Image, ImageQuality


def _img(seed, w=64, h=64):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
    data[..., 3] = 255
    return Image(data=data, quality=ImageQuality.LOW)


def test_atlas_content_hash_dedup_and_alias_safety():
    a = ImageAtlas()
    i1 = _img(1)
    r1 = a.add(i1)
    # same CONTENT in a different array dedups (id() keying would not)
    i2 = Image(data=i1.data.copy(), quality=ImageQuality.LOW)
    assert a.add(i2) == r1
    assert len(a.entries) == 1
    # different content allocates
    assert a.add(_img(2)) != r1
    assert len(a.entries) == 2


def test_atlas_generation_eviction_bounded():
    a = ImageAtlas(width=128)
    a.MAX_HEIGHT = 256   # 8 slots of 64x64 -> capacity 8 images
    imgs = [_img(s) for s in range(40)]
    positions = {}
    for frame in range(12):
        a.begin_generation()
        # frames cycle through a working set of 6 (fits), changing by 2
        lo = (frame * 2) % 30
        for i in range(lo, lo + 6):
            positions[(frame, i)] = a.add(imgs[i])
        arr = a.array()
        assert arr.shape[0] <= 256, "atlas grew past its extent"
    assert a.evictions > 0, "eviction never triggered"
    # an image used in the CURRENT generation must keep a stable slot
    a.begin_generation()
    p1 = a.add(imgs[0])
    p2 = a.add(imgs[0])
    assert p1 == p2


def test_atlas_overflow_raises():
    a = ImageAtlas(width=128)
    a.MAX_HEIGHT = 128
    a.begin_generation()
    a.add(_img(0, 128, 64))
    a.add(_img(1, 128, 64))
    with pytest.raises(RuntimeError):
        a.add(_img(2, 128, 64))   # live set exceeds the extent


def test_resolver_image_cycling_stable_output():
    """Render frames cycling more images than past atlas states; output for
    a given frame must be identical regardless of eviction history."""
    res = Resolver()
    res.atlas.MAX_HEIGHT = 256
    res.atlas.width = 128
    imgs = [_img(100 + s) for s in range(12)]
    params = RenderParams(64, 64)
    r = Renderer()

    def frame(i):
        s = Scene()
        s.draw_image(imgs[i % 12], Affine.identity())
        rs = res.resolve(s.encoding, params)
        return r.render_resolved(rs, params)

    first = [np.asarray(frame(i)) for i in range(12)]
    again = [np.asarray(frame(i)) for i in range(12)]
    for i in range(12):
        np.testing.assert_array_equal(first[i], again[i])
    assert res.atlas.evictions > 0


def test_glyph_cache_lru():
    from vello_tpu.text import GlyphCache, default_font
    font = default_font()
    c = GlyphCache(max_entries=4)
    g = [font.glyph_id(ch) for ch in "abcdefg"]
    for gid in g[:4]:
        c.outline(font, gid)
    c.outline(font, g[0])          # refresh 'a'
    c.outline(font, g[4])          # evicts LRU ('b'), not everything
    m0 = c.misses
    c.outline(font, g[0])          # still cached
    c.outline(font, g[3])
    assert c.misses == m0
    c.outline(font, g[1])          # 'b' was evicted -> miss
    assert c.misses == m0 + 1
