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
    (dp, sp) and overflow (B,) per scene. When height_tiles doesn't divide
    by the sp axis size the framebuffer is padded up to the next stripe
    multiple (the trailing rows render empty — geometry there is culled);
    callers crop to the requested height.
    """
    import dataclasses

    n_sp = mesh.shape["sp"]
    ht = static.height_tiles
    if ht % n_sp:
        static = dataclasses.replace(
            static, height=((ht + n_sp - 1) // n_sp) * n_sp * TILE_H)

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


class MeshRenderer:
    """Batched multi-chip serving renderer: the mesh-level analog of
    models.renderer.Renderer, with the same capacity-tier pick and
    overflow-retry loop (reference analog: the MT dispatcher's cost
    batching, sparse_strips/vello_cpu/src/dispatch/multi_threaded.rs:57-116
    — here the batch shards dp x sp over a jax Mesh instead of a thread
    pool).

    The batch shares ONE capacity tier (elementwise max over the scenes'
    tiers) so all dp shards run the same compiled program; per-scene
    overflow flags are OR-combined and one retry grows the shared tier.
    Flat (non-layered) scenes only — layered plans are per-scene data
    structures; render those per scene with Renderer.
    """

    def __init__(self, mesh: Mesh, max_retries: int = 3):
        self.mesh = mesh
        self.max_retries = max_retries
        self.last_profile: dict = {}
        self._fn_cache: dict = {}

    def _shared_caps(self, resolved, params):
        from ..encoding.config import Capacities
        caps = [r.capacities(params) for r in resolved]
        return Capacities(*[max(vals) for vals in zip(
            *[c.key() for c in caps])])

    def render_batch(self, resolved, params) -> np.ndarray:
        """resolved: list of B ResolvedScene (B divisible by the dp axis).
        Returns (B, H, W, 4) f32 images."""
        from ..encoding.config import Capacities, next_size
        from ..models.renderer import pack_buffers

        n_dp = self.mesh.shape["dp"]
        if len(resolved) % n_dp:
            raise ValueError(f"batch {len(resolved)} % dp {n_dp} != 0")
        for r in resolved:
            if any(k in (3, 4) for k in r.draw_kind):
                raise ValueError("MeshRenderer handles flat scenes; "
                                 "render layered scenes via Renderer")
        kinds = set()
        for r in resolved:
            k = set(int(v) for v in r.paint_kind)
            if 2 in k:
                from ..encoding.resolve import PAINT_IMAGE
                quals = r.image_rec[r.paint_kind == PAINT_IMAGE, 6]
                k |= {10 + int(q) for q in set(quals.tolist())}
            kinds |= k
        kinds = tuple(sorted(kinds))
        caps = self._shared_caps(resolved, params)
        has_eo = True
        if params.antialiasing in ("msaa8", "msaa16"):
            has_eo = any(bool((r.fill_rule == 1).any()) for r in resolved)
        has_edge = any(bool(getattr(r, "has_left_edge", True))
                       for r in resolved)
        has_stroke = any(bool(getattr(r, "has_stroke", False))
                         for r in resolved)
        max_lines = max(int(getattr(r, "max_lines", 64)) for r in resolved)
        est_live = max(r.est_live for r in resolved)
        n_paths_max = max(r.n_paths for r in resolved)
        overflow = 0
        for attempt in range(self.max_retries + 1):
            n_live = min(caps.n_path_tiles,
                         next_size(min(caps.n_path_tiles,
                                       est_live + 64 + n_paths_max // 16),
                                   align=128))
            static = PipelineStatic(
                caps_key=caps.key(), width=params.width,
                height=params.height, kinds_present=kinds,
                aa=params.antialiasing, has_evenodd=has_eo,
                lowp=(getattr(params, "render_mode", "quality") == "speed"),
                n_live=0 if n_live >= caps.n_path_tiles else n_live,
                has_edge=has_edge, has_stroke=has_stroke,
                max_lines=max_lines)
            bufs = [pack_buffers(r, caps, params) for r in resolved]
            # ragged resource arrays (ramps grow per scene; the atlas page
            # grows under pressure): pad each to the batch max so stacking
            # is rectangular, and zero-fill stroke buffers for scenes
            # without strokes when the batch static enables the branch
            for name in ("ramps", "atlas"):
                shp = np.max([b[name].shape for b in bufs], axis=0)
                for b in bufs:
                    pad = [(0, int(t) - int(s))
                           for s, t in zip(b[name].shape, shp)]
                    if any(p[1] for p in pad):
                        b[name] = np.pad(b[name], pad)
            if has_stroke:
                for b, r in zip(bufs, resolved):
                    if "seg_hw" not in b:
                        b["seg_hw"] = np.zeros(caps.n_segs, np.float32)
                        b["seg_join"] = np.zeros(caps.n_segs, np.int32)
                        b["style_hw"] = np.zeros(caps.n_styles, np.float32)
            key = (static, self.mesh)
            if key not in self._fn_cache:
                self._fn_cache[key] = build_sharded_renderer(
                    static, self.mesh)
            bufs_b = {k: jnp.stack([jnp.asarray(b[k]) for b in bufs])
                      for k in bufs[0]}
            imgs, overflow_b = self._fn_cache[key](bufs_b)
            overflow_b = np.asarray(jax.device_get(overflow_b))
            overflow = int(np.bitwise_or.reduce(overflow_b))
            if overflow == 0:
                imgs = np.asarray(jax.device_get(imgs))
                self.last_profile = {
                    "retries": attempt,
                    "tier": dict(zip(
                        ["tags", "points", "segs", "lines", "touches",
                         "path_tiles", "paths", "transforms", "styles",
                         "ramps", "edges"], caps.key())),
                    "mesh": dict(self.mesh.shape),
                }
                return imgs[:, :params.height, :params.width]
            if overflow & 32:
                has_edge = True
            if overflow & 16:
                est_live = min(est_live * 2 + 128, caps.n_path_tiles)
            caps = Capacities(
                n_tags=caps.n_tags, n_points=caps.n_points,
                n_segs=caps.n_segs,
                n_lines=caps.n_lines * (2 if overflow & 1 else 1),
                n_touches=caps.n_touches * (2 if overflow & 4 else 1),
                n_path_tiles=caps.n_path_tiles * (2 if overflow & 8 else 1),
                n_paths=caps.n_paths, n_transforms=caps.n_transforms,
                n_styles=caps.n_styles, n_ramps=caps.n_ramps,
                n_edges=caps.n_edges * (2 if overflow & 2 else 1))
        raise RuntimeError(f"sharded render overflow persisted after "
                           f"{self.max_retries} retries (flags={overflow})")
