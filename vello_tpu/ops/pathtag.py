"""Device-side path tag scan + segment decode.

The reference runs a 2/3-level reduce-then-scan over a PathMonoid
(``pathtag_reduce.wgsl``/``pathtag_scan.wgsl``, ``vello_encoding/src/path.rs:
321-366``). Our tag monoid is a vector of additive counters, so on TPU the
whole scan collapses to exclusive cumsums — one fused XLA op per counter —
followed by point gathers to decode each segment's control points.

Padding = masking: tag 0 contributes nothing, so streams padded with zeros
need no explicit validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pathtag_scan(tags: jnp.ndarray):
    """tags: (T,) int32. Returns dict of per-tag-slot scanned fields."""
    kind = tags & 3
    is_seg = (kind > 0).astype(jnp.int32)
    end_bit = ((tags >> 2) & 1) * is_seg
    size = kind + end_bit
    incl = jnp.cumsum(size)
    pt_off = incl - size                      # exclusive: point offset
    tmark = (tags >> 5) & 1
    smark = (tags >> 6) & 1
    pmark = (tags >> 4) & 1
    path_ix = jnp.cumsum(pmark) - pmark       # markers follow their segments
    trans_ix = jnp.cumsum(tmark) - 1          # markers precede; active = n-1
    style_ix = jnp.cumsum(smark) - 1
    return {
        "kind": kind,
        "is_seg": is_seg,
        "pt_off": pt_off,
        "path_ix": path_ix,
        "trans_ix": jnp.maximum(trans_ix, 0),
        "style_ix": jnp.maximum(style_ix, 0),
    }


def decode_and_transform(tags, data, transforms, styles, data4=None,
                         style_hw=None):
    """Decode segments at every tag slot (kind==0 slots are inert) and apply
    the per-segment affine transform. Returns per-slot arrays.

    data: (Pt, 2) f32; transforms: (Nt, 6); styles: (Ns,) i32.
    data4: optional (Pt, 4, 2) shifted windows (data4[i,k] == data[i+k]) —
    one row gather decodes all four control points.
    style_hw: optional (Ns,) f32 per-style stroke half-widths — adds "hw"
    (device-space: scaled by sqrt|det T|) and "join" per slot.
    """
    scan = pathtag_scan(tags)
    kind = scan["kind"]
    off = scan["pt_off"]
    npt = len(data)
    if data4 is None and npt:
        # Build the shifted windows ON DEVICE (4 cheap rolls) — uploading
        # a host-built data4 costs 4x the data stream in tunnel transfer,
        # and 4 separate row gathers cost 4x the gather time.
        data4 = jnp.stack([jnp.roll(data, -k, axis=0) for k in range(4)],
                          axis=1)
    if data4 is not None:
        idx = jnp.clip(off, 0, max(npt - 1, 0))
        pts = data4[idx]                      # (T, 4, 2)
        k_ar = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        valid = (k_ar <= kind[:, None]) & (scan["is_seg"][:, None] == 1)
        pts = jnp.where(valid[:, :, None], pts, 0.0)
    else:
        pts = []
        for i in range(4):
            idx = jnp.clip(off + i, 0, max(npt - 1, 0))
            valid = (i <= kind) & (scan["is_seg"] == 1)
            p = jnp.where(valid[:, None], data[idx], 0.0)
            pts.append(p)
        pts = jnp.stack(pts, axis=1)          # (T, 4, 2)
    t = transforms[jnp.clip(scan["trans_ix"], 0, max(len(transforms) - 1, 0))]
    x = pts[..., 0] * t[:, None, 0] + pts[..., 1] * t[:, None, 2] \
        + t[:, None, 4]
    y = pts[..., 0] * t[:, None, 1] + pts[..., 1] * t[:, None, 3] \
        + t[:, None, 5]
    tp = jnp.stack([x, y], axis=-1)
    tp = jnp.where(scan["is_seg"][:, None, None] == 1, tp, 0.0)
    fill = styles[jnp.clip(scan["style_ix"], 0, max(len(styles) - 1, 0))]
    out = {
        "kind": kind * scan["is_seg"],
        "points": tp,
        "path_ix": scan["path_ix"],
        "fill_rule": fill,
    }
    if style_hw is not None:
        hw = style_hw[jnp.clip(scan["style_ix"], 0,
                               max(len(style_hw) - 1, 0))]
        det = t[:, 0] * t[:, 3] - t[:, 1] * t[:, 2]
        out["hw"] = hw * jnp.sqrt(jnp.abs(det))
        out["join"] = (1 - ((tags >> 2) & 1)) * scan["is_seg"]
    return out
