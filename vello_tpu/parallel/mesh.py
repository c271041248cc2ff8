"""Multi-chip rendering: scene-batch data parallelism x framebuffer-stripe
parallelism over a jax.sharding.Mesh.

The reference is single-device; its scaling axes are intra-frame (SURVEY.md
§2.5). On TPU pods the natural multi-chip axes are:

* ``dp`` — independent frames (batch rendering / serving): embarrassingly
  parallel, perfect ICI-free scaling.
* ``sp`` — framebuffer stripes within one frame (the sequence-parallel
  analog): every chip runs the (cheap, fully replicated) geometry stages and
  composites only its own horizontal stripe of tile rows; stripes stay
  sharded on-device (output sharding does the stitching). Overflow flags are
  combined with a psum over the stripe axis.

Round-2 roadmap: shard the touch/fragment axes too (sorted partition +
ppermute exchange) so geometry work also scales with sp.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encoding.config import TILE_H
from ..pipeline.render import PipelineStatic, render_frame


def make_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_sp, \
        f"need {n_dp * n_sp} devices, have {len(devices)}"
    dev = np.asarray(devices[:n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def _stripe_frame(bufs, static: PipelineStatic, n_sp: int):
    """Render this device's stripe; runs under shard_map with axis 'sp'."""
    ht_local = static.height_tiles // n_sp
    stripe = jax.lax.axis_index("sp") * ht_local
    img, overflow = render_frame(bufs, static, stripe=(stripe, ht_local))
    overflow = jax.lax.psum(overflow, axis_name="sp")
    return img, overflow


def build_sharded_renderer(static: PipelineStatic, mesh: Mesh):
    """Jitted (B, ...) batched multi-chip renderer.

    Input: pytree of buffers with a leading batch axis B (divisible by dp).
    Output: images (B, H_padded, W_padded, 4) sharded (dp, sp) and overflow
    (B,) per scene. static.height_tiles must divide by the sp axis size.
    """
    n_sp = mesh.shape["sp"]
    assert static.height_tiles % n_sp == 0, \
        f"height_tiles {static.height_tiles} % sp {n_sp} != 0"

    def per_batch(bufs_b):
        f = partial(_stripe_frame, static=static, n_sp=n_sp)
        return jax.vmap(f)(bufs_b)

    mapped = jax.shard_map(
        per_batch, mesh=mesh,
        in_specs=P("dp"),
        out_specs=(P("dp", "sp"), P("dp")),
        check_vma=False)
    return jax.jit(mapped)


def render_batch(bufs_list, static: PipelineStatic, mesh: Mesh):
    """Convenience host API: stack per-scene buffer dicts, render sharded."""
    bufs_b = {k: jnp.stack([jnp.asarray(b[k]) for b in bufs_list])
              for k in bufs_list[0]}
    fn = build_sharded_renderer(static, mesh)
    imgs, overflow = fn(bufs_b)
    return np.asarray(jax.device_get(imgs)), np.asarray(
        jax.device_get(overflow))
