"""Multi-chip rendering: scene-batch data parallelism x framebuffer-stripe
parallelism over a jax.sharding.Mesh.

The reference is single-device; its scaling axes are intra-frame (SURVEY.md
§2.5). On TPU pods the natural multi-chip axes are:

* ``dp`` — independent frames (batch rendering / serving): embarrassingly
  parallel, perfect ICI-free scaling.
* ``sp`` — intra-frame parallelism (the sequence-parallel analog), on TWO
  axes at once: the geometry stages (flatten, tiling, coverage) are sharded
  by SEGMENT slices — each chip processes 1/n of the path segments and the
  additive partial per-fragment coverage + backdrop sums are combined with
  ONE psum (67 MB all-reduce rides ICI); the fine/composite stages are
  sharded by framebuffer STRIPES of tile rows, which stay sharded on-device
  (output sharding does the stitching). Overflow flags are psum'd.
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


def _stripe_frame(bufs, plan_dyn=None, *, static: PipelineStatic,
                  n_sp: int, scan_key=None):
    """Render this device's stripe; runs under shard_map with axis 'sp'.

    Geometry (flatten/tiling/coverage) is sharded over 'sp' by
    path-aligned segment slices (msaa coverage combines with one
    owning-shard-complete psum; area winding with an additive psum);
    fine/composite is sharded by framebuffer stripes — both the geometry
    and pixel work scale with the axis. Layered scenes run the
    plan-as-data compositor per stripe with the same sharded geometry."""
    ht_local = static.height_tiles // n_sp
    stripe = jax.lax.axis_index("sp") * ht_local
    if scan_key is not None:
        from ..pipeline.layered import render_frame_layered_scan
        img, overflow = render_frame_layered_scan(
            bufs, plan_dyn, static, scan_key, stripe=(stripe, ht_local),
            geom_axis="sp", geom_shards=n_sp)
    else:
        img, overflow = render_frame(bufs, static,
                                     stripe=(stripe, ht_local),
                                     geom_axis="sp", geom_shards=n_sp)
    overflow = jax.lax.psum(overflow, axis_name="sp")
    return img, overflow


def build_sharded_renderer(static: PipelineStatic, mesh: Mesh,
                           scan_key=None):
    """Jitted (B, ...) batched multi-chip renderer.

    Input: pytree of buffers with a leading batch axis B (divisible by dp);
    layered scenes also pass their plan_dyn tables (replicated) when
    scan_key is given. Output: images (B, H_padded, W_padded, 4) sharded
    (dp, sp) and overflow (B,) per scene. static.height_tiles must divide
    by the sp axis size.
    """
    n_sp = mesh.shape["sp"]
    assert static.height_tiles % n_sp == 0, \
        f"height_tiles {static.height_tiles} % sp {n_sp} != 0"

    def per_batch(bufs_b, plan_dyn=None):
        if scan_key is not None:
            f = partial(_stripe_frame, static=static, n_sp=n_sp,
                        scan_key=scan_key)
            return jax.vmap(f, in_axes=(0, None))(bufs_b, plan_dyn)
        f = partial(_stripe_frame, static=static, n_sp=n_sp)
        return jax.vmap(f)(bufs_b)

    if scan_key is not None:
        mapped = jax.shard_map(
            per_batch, mesh=mesh,
            in_specs=(P("dp"), P()),
            out_specs=(P("dp", "sp"), P("dp")),
            check_vma=False)
    else:
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
