"""Depth-chain passes: LinearizeDepth, DepthPeeling, GuardBand,
CompressNormals, ReconstructNormals.

References:
  LinearizeDepth/Linearize.ps.slang (zNear*zFar/(zFar + d*(zNear-zFar)))
  DepthPeeling/DepthPeeling.3d.slang:43-55 (re-raster, reject <= first+minSep)
  Utils/GuardBand/GuardBand.cpp:58-100 (dictionary guardBand/uvMin/uvMax)
  CompressNormals.cpp:77-78 (octahedral pack, view-space option)
  ReconstructNormals.cpp:86-87 (normals from depth differences)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.raster import rasterize
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import (encode_normal_2x16, encode_normal_2x8, normalize,
                          transform_vector)


@register_pass("LinearizeDepth")
class LinearizeDepth(RenderPass):
    SCHEMA = dict(depthFormat="R32Float")

    def reflect(self, ctx):
        return PassReflection().add_input("depth").add_output("linearDepth")

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        return {"linearDepth": cam.linearize_depth(inputs["depth"])}, None


@register_pass("DepthPeeling")
class DepthPeeling(RenderPass):
    """Second depth layer: re-rasterize, discarding fragments closer than
    firstDepth + minSeparation (reference DepthPeeling.3d.slang:43-55).
    Input linearZ is the first layer's linear depth; output depth2 is
    NON-linear (the graph runs it through LinearizeDepth0, scripts/SVAO.py:67)."""

    SCHEMA = dict(cullMode="Back", depthFormat="D32Float",
                  minSeparationDistance=0.01, maxPerTile=256)

    def reflect(self, ctx):
        return PassReflection().add_input("linearZ").add_output("depth2")

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        vis = rasterize(cam.view_proj_no_jitter, ctx.scene.positions,
                        width=ctx.width, height=ctx.height,
                        jitter_x=cam.jitter_x, jitter_y=cam.jitter_y,
                        cull=self.cfg["cullMode"].lower(),
                        max_per_tile=int(self.cfg["maxPerTile"]),
                        depth_floor=inputs["linearZ"],
                        min_separation=float(self.cfg["minSeparationDistance"]))
        return {"depth2": vis["depth"]}, None


@register_pass("GuardBand")
class GuardBand(RenderPass):
    """Writes guardBand + uvMin/uvMax into the graph dictionary
    (reference GuardBand.cpp:58-66). The graph driver grows the render
    resolution by 2*guardBand; consumers read dict['guardBand']
    (e.g. SVAO.cpp:322-323)."""

    SCHEMA = dict(guardBand=0)

    def execute(self, ctx, inputs, state=None):
        g = int(self.cfg["guardBand"])
        ctx.dictionary["guardBand"] = g
        ctx.dictionary["guardBand.uvMin"] = ((g + 0.5) / ctx.width,
                                             (g + 0.5) / ctx.height)
        ctx.dictionary["guardBand.uvMax"] = ((ctx.width - g - 0.5) / ctx.width,
                                             (ctx.height - g - 0.5) / ctx.height)
        return {}, None


@register_pass("CompressNormals")
class CompressNormals(RenderPass):
    """Octahedral normal packing (reference CompressNormals.cpp:77-78).
    viewSpace=True converts world->view first (what SVAO's loadNormal expects,
    Common.slang:98-103)."""

    SCHEMA = dict(viewSpace=True, use16Bit=True)

    def reflect(self, ctx):
        return PassReflection().add_input("normalW").add_output("normalOut")

    def execute(self, ctx, inputs, state=None):
        n = inputs["normalW"][..., :3]
        if self.cfg["viewSpace"]:
            n = transform_vector(ctx.scene.camera.view_mat, n)
        n = normalize(n)
        if self.cfg["use16Bit"]:
            packed = encode_normal_2x16(n)
        else:
            packed = encode_normal_2x8(n)
        return {"normalOut": packed}, None


@register_pass("ReconstructNormals")
class ReconstructNormals(RenderPass):
    """View-space normals from linear depth via central differences
    (reference ReconstructNormals.cpp:86-87)."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection().add_input("linearZ").add_output("normals")

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        z = inputs["linearZ"]
        h, w = z.shape
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        p = cam.uv_to_view_space(uv, z)
        dx = jnp.gradient(p, axis=1)
        dy = jnp.gradient(p, axis=0)
        n = normalize(jnp.cross(dy, dx))
        # orient toward the camera
        flip = jnp.sum(n * p, axis=-1, keepdims=True) > 0
        return {"normals": jnp.where(flip, -n, n)}, None


@register_pass("MaterialDoubleSided")
class MaterialDoubleSided(RenderPass):
    """Extracts the double-sided material flag (reference
    Source/RenderPasses/MaterialDoubleSided/, used by the HBAO graph)."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection().add_input("mtlData").add_output("doubleSided")

    def execute(self, ctx, inputs, state=None):
        from ..ops.materials import fetch_material_scalar
        mid = inputs["mtlData"]
        ds = fetch_material_scalar(ctx.scene.mat_double_sided,
                                   jnp.maximum(mid, 0))
        return {"doubleSided": jnp.where(mid >= 0, ds, False)}, None
