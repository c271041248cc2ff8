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
    a.MAX_WIDTH = 128   # pin the growth bound so overflow is reachable
    a.begin_generation()
    a.add(_img(0, 128, 64))
    a.add(_img(1, 128, 64))
    with pytest.raises(RuntimeError):
        a.add(_img(2, 128, 64))   # live set exceeds the extent


def test_atlas_width_growth_position_stable():
    """An image wider than the page grows the page (image_cache.rs
    growth role); existing entries keep their coordinates."""
    a = ImageAtlas(width=128)
    a.begin_generation()
    p0 = a.add(_img(0, 64, 64))
    arr0 = a.array()
    p1 = a.add(_img(1, 512, 32))   # wider than the 128 page
    assert a.width >= 512
    assert a.add(_img(0, 64, 64)) == p0, "existing entry moved on growth"
    arr1 = a.array()
    assert arr1.shape[1] >= 512
    # old entry's pixels unchanged at its stable position
    x, y = p0[0], p0[1]
    np.testing.assert_array_equal(arr1[y:y + 64, x:x + 64],
                                  arr0[y:y + 64, x:x + 64])
    assert a.rebuilds == 1, "growth must not force a full re-blit"
    assert p1[2] == 512


def test_atlas_incremental_array_no_rebuilds():
    """Steady-state animation: unchanged resolves return the cached page
    (no per-frame premultiply/blit); incremental adds blit only the new
    entry; only eviction forces a full rebuild."""
    a = ImageAtlas(width=128)
    a.begin_generation()
    a.add(_img(0, 64, 64))
    first = a.array()
    assert a.rebuilds == 1
    # no change -> identical cached object, zero work
    assert a.array() is first
    a.begin_generation()
    a.add(_img(0, 64, 64))        # same content: still cached
    assert a.array() is first
    # incremental add: new array (copy-on-write), no full rebuild
    a.add(_img(1, 64, 64))
    second = a.array()
    assert second is not first and a.rebuilds == 1
    # the earlier returned page was not mutated in place
    assert first[:64, :64].any() and first[64:, :].sum() == 0


def test_wide_image_renders():
    """A 2048-px-wide image (wider than the initial 1024 page) resolves
    and renders; reference accepts up to 8192x8192 (image_cache.rs)."""
    from vello_tpu import Scene, Affine, RenderParams
    from vello_tpu.oracle import OracleRenderer
    rng = np.random.default_rng(7)
    data = rng.integers(0, 255, size=(8, 2048, 4), dtype=np.uint8)
    data[..., 3] = 255
    img = Image(data)
    s = Scene()
    s.draw_image(img, Affine.scale(1 / 16.0))   # fit 2048 -> 128
    params = RenderParams(128, 16)
    out = np.asarray(OracleRenderer().render(s, params))
    assert out[:, :, :3].std() > 0.01, "wide image did not render"


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


def test_atlas_pages_past_single_page():
    """Multi-page stacking (multi_atlas.rs role): heights keep growing in
    PAGE_H virtual pages past the first page, bounded by the memory
    budget, with entries at absolute (x, y) — blits land where the
    entries say across page boundaries."""
    a = ImageAtlas(width=64)
    a.MAX_WIDTH = 64          # pin width so growth must go DOWN the pages
    a.PAGE_H = 128            # small pages for the test
    a.MAX_HEIGHT = 512        # 4 pages
    a.begin_generation()
    ps = [a.add(_img(s, 64, 64)) for s in range(8)]   # fills all 4 pages
    assert max(p[1] for p in ps) >= 128, "never crossed a page boundary"
    arr = a.array()
    assert arr.shape[0] >= 512 and arr.shape[1] == 64
    for s, (x, y, w, h) in enumerate(ps):
        expect = _img(s, 64, 64).data.astype(np.float32) / 255.0
        got = arr[y:y + h, x:x + w]
        np.testing.assert_allclose(got[..., :3],
                                   expect[..., :3] * expect[..., 3:4],
                                   atol=1e-6)
    # a 9th live image exceeds the budget even after eviction
    with pytest.raises(RuntimeError):
        a.add(_img(99, 64, 64))


def test_atlas_pressure_eviction_across_pages():
    """Under sustained pressure (working set cycling beyond the budget),
    generation eviction keeps the multi-page atlas inside its extent and
    rendering-valid (current-generation entries keep stable slots)."""
    a = ImageAtlas(width=64)
    a.MAX_WIDTH = 64
    a.PAGE_H = 128
    a.MAX_HEIGHT = 384        # 3 pages; 2-generation live union fits
    for frame in range(10):
        a.begin_generation()
        lo = (frame * 2) % 24
        for i in range(3):
            a.add(_img(lo + i, 64, 64))
        # re-query after all adds: an eviction mid-frame relocates
        # earlier entries (the Resolver does the same re-query pass)
        pos = [a.add(_img(lo + i, 64, 64)) for i in range(3)]
        arr = a.array()
        assert a.height <= 384      # arr pads to a power-of-two tier
        # every current-generation entry must be where it says it is
        for i, (x, y, w, h) in enumerate(pos):
            expect = _img(lo + i, 64, 64).data.astype(np.float32) / 255.0
            np.testing.assert_allclose(
                arr[y:y + h, x:x + w][..., :3],
                expect[..., :3] * expect[..., 3:4], atol=1e-6)
    assert a.evictions > 0


def test_atlas_budget_property():
    """The default MAX_HEIGHT derives from the memory budget env var and
    quantizes to whole pages."""
    import os
    a = ImageAtlas(width=8192)
    old = os.environ.get("VELLO_TPU_ATLAS_BUDGET_MB")
    try:
        os.environ["VELLO_TPU_ATLAS_BUDGET_MB"] = "2048"
        assert a.MAX_HEIGHT == 16384        # 2 GB / (8192*16 B) rows
        os.environ["VELLO_TPU_ATLAS_BUDGET_MB"] = "64"
        assert a.MAX_HEIGHT == a.PAGE_H     # floor: one page
    finally:
        if old is None:
            os.environ.pop("VELLO_TPU_ATLAS_BUDGET_MB", None)
        else:
            os.environ["VELLO_TPU_ATLAS_BUDGET_MB"] = old
