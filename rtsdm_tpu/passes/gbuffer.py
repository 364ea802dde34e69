"""G-buffer passes (reference Source/RenderPasses/GBuffer/ — GBufferRaster
channels GBuffer.cpp:39-50, depth/linearZ GBufferRaster.cpp:50-55,92 — and
DepthPass).

TPU design: one visibility-buffer rasterization, then channel materialization
by gathers — XLA dead-code-eliminates channels nobody consumes after the
whole-graph trace, so declaring all of them is free.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.raster import fetch_vertex_attributes, rasterize
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import normalize, transform_point


def pattern_jittered_scene(scene, pattern, sample_count, frame_index,
                           width, height):
    """Per-frame camera sub-pixel jitter from the pass's sample pattern —
    the reference updates the camera from a CPUSampleGenerator each frame
    (GBufferBase::updateSamplePattern; Camera::setJitter scales by
    1/resolution). Center = unchanged; otherwise offset index cycles with
    frame_index so TAA/AccumulatePass see a moving sample point."""
    if pattern in ("Center", None, ""):
        return scene
    from ..utils.sampling import sample_pattern_offsets
    from ..utils.structs import replace
    offs = jnp.asarray(sample_pattern_offsets(pattern, int(sample_count)))
    idx = jnp.mod(jnp.asarray(frame_index, jnp.int32), offs.shape[0])
    o = offs[idx]
    cam = scene.camera
    cam2 = replace(cam, jitter_x=o[0] / width, jitter_y=o[1] / height)
    return scene.with_camera(cam2)


def raster_gbuffer(scene, width, height, cull="back", max_per_tile=256,
                   apply_jitter=True):
    """Shared raster + channel materialization."""
    cam = scene.camera
    jx = cam.jitter_x if apply_jitter else 0.0
    jy = cam.jitter_y if apply_jitter else 0.0
    vis = rasterize(cam.view_proj_no_jitter, scene.positions,
                    width=width, height=height, jitter_x=jx, jitter_y=jy,
                    cull=cull, max_per_tile=max_per_tile)
    tid, bary = vis["tri_id"], vis["bary"]
    hit = tid >= 0

    # one fused materialization for every channel (single chunk walk on the
    # Pallas tier; identical XLA gathers below threshold)
    interp = [scene.positions, scene.normals, scene.texcoords]
    has_prev = scene.prev_positions is not None
    if has_prev:
        interp.append(scene.prev_positions)
    fetched = fetch_vertex_attributes(
        tid, bary, interp, [scene.face_normals(), scene.material_id])
    pos_w, norm_w, tex_c = fetched[0], fetched[1], fetched[2]
    norm_w = jnp.where(hit[..., None], normalize(norm_w), 0.0)
    face_n = jnp.where(hit[..., None], fetched[-2], 0.0)
    mtl = jnp.where(hit, fetched[-1], -1)

    # motion vectors: texC + mvec = previous-frame uv (consumed by TAA,
    # reference TAA.ps.slang:121-130); computed with the no-jitter matrices.
    # Animated geometry projects LAST frame's vertex positions (object
    # motion, reference GBuffer motion-vector path with prevPosW).
    h, w = tid.shape
    if has_prev:
        prev_pos_w = jnp.where(hit[..., None], fetched[3], pos_w)
    else:
        prev_pos_w = pos_w
    prev_clip = transform_point(cam.prev_view_proj_no_jitter, prev_pos_w)
    prev_w = jnp.where(prev_clip[..., 3] == 0.0, 1.0, prev_clip[..., 3])
    prev_uv = jnp.stack([prev_clip[..., 0] / prev_w * 0.5 + 0.5,
                         0.5 - prev_clip[..., 1] / prev_w * 0.5], axis=-1)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    cur_uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    mvec = jnp.where(hit[..., None], prev_uv - cur_uv, 0.0)

    return {
        "depth": vis["depth"],
        "posW": jnp.concatenate([pos_w, hit[..., None].astype(jnp.float32)], -1),
        "normW": norm_w,
        "faceNormalW": face_n,
        "texC": tex_c,
        "mvec": mvec,
        "mtlData": mtl.astype(jnp.int32),
        "tri_id": tid,
        "bary": bary,
    }


@register_pass("GBufferRaster")
class GBufferRaster(RenderPass):
    """reference Source/RenderPasses/GBuffer/GBufferRaster.cpp"""

    SCHEMA = dict(outputSize="Default", samplePattern="Center", sampleCount=8,
                  useAlphaTest=True, adjustShadingNormals=True,
                  forceCullMode=False, cull="Back", maxPerTile=256)

    def reflect(self, ctx):
        r = PassReflection()
        for c in ["depth", "posW", "normW", "faceNormalW", "texC", "mvec",
                  "mtlData", "tri_id", "bary"]:
            r.add_output(c)
        return r

    def execute(self, ctx, inputs, state=None):
        scene = pattern_jittered_scene(ctx.scene, self.cfg["samplePattern"],
                                       self.cfg["sampleCount"],
                                       ctx.frame_index, ctx.width, ctx.height)
        out = raster_gbuffer(scene, ctx.width, ctx.height,
                             cull=self.cfg["cull"].lower(),
                             max_per_tile=int(self.cfg["maxPerTile"]))
        return out, None


@register_pass("DepthPass")
class DepthPass(RenderPass):
    """Depth pre-pass (reference Source/RenderPasses/DepthPass/). With a
    single fused raster there is nothing to pre-warm; kept for graph parity —
    emits the same depth channel."""

    SCHEMA = dict(depthFormat="D32Float", useAlphaTest=True, cullMode="Back",
                  maxPerTile=256)

    def reflect(self, ctx):
        return PassReflection().add_output("depth")

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        vis = rasterize(cam.view_proj_no_jitter, ctx.scene.positions,
                        width=ctx.width, height=ctx.height,
                        jitter_x=cam.jitter_x, jitter_y=cam.jitter_y,
                        cull=self.cfg["cullMode"].lower(),
                        max_per_tile=int(self.cfg["maxPerTile"]))
        return {"depth": vis["depth"]}, None
