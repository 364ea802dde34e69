"""Shading passes: EnvMapPass, ForwardLighting, DeferredLighting, RayShadow.

References:
  EnvMapPass/EnvMapPass.ps.slang (env lookup along the camera ray)
  ForwardLighting/ForwardLighting.3d.slang (emission + ambient + env +
    per-light shadowed direct)
  RayShadow/RayShadow.ps.slang (inline ray-query visibility per light)

TPU design: ForwardLighting re-derives the G-buffer via the shared
raster_gbuffer — under whole-graph jit XLA CSE merges it with the
GBufferRaster pass's identical call, so this costs nothing while keeping the
reference's graph wiring (the ref re-rasters the scene too).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..scene.scene import LIGHT_DIRECTIONAL, LIGHT_POINT
from ..utils.math import normalize, saturate
from .gbuffer import raster_gbuffer


def _uv_grid(h, w):
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)


@register_pass("EnvMapPass")
class EnvMapPass(RenderPass):
    """Environment radiance along the camera ray for every pixel
    (EnvMapPass.ps.slang). With a constant-radiance environment this is a
    fill; a lat-long env texture can be added to Scene later."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection().add_input("depth").add_output("color")

    def execute(self, ctx, inputs, state=None):
        h, w = inputs["depth"].shape
        scene = ctx.scene
        if scene.env_map is not None:
            from ..scene.textures import sample_env
            xs = jnp.arange(w, dtype=jnp.float32)
            ys = jnp.arange(h, dtype=jnp.float32)
            px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
            _, dirs = scene.camera.compute_ray_pinhole(px, (w, h))
            color = sample_env(scene.env_map, dirs) * scene.env_radiance
        else:
            color = jnp.broadcast_to(scene.env_radiance, (h, w, 3))
        return {"color": color}, None


@register_pass("RayShadow")
class RayShadow(RenderPass):
    """Per-light shadow visibility (RayShadow.ps.slang:131-186): one ray from
    each shaded point toward each analytic light; any hit in (tmin, tmax)
    occludes. Uses the shared ray-tracing op."""

    SCHEMA = dict(pointLightClip=0.1, maxLights=2)

    def reflect(self, ctx):
        return (PassReflection().add_input("posW").add_input("normalW")
                .add_output("visibility"))

    def execute(self, ctx, inputs, state=None):
        from ..ops import rt  # local import: rt op lands with the RT milestone
        scene = ctx.scene
        pos_w = inputs["posW"]
        valid = pos_w[..., 3] > 0.0
        p = pos_w[..., :3]
        n = inputs["normalW"][..., :3]
        h, w = valid.shape
        n_lights = min(int(scene.num_lights), int(self.cfg["maxLights"]))

        vis_slices = []
        for li in range(n_lights):
            is_dir = scene.light_type[li] == LIGHT_DIRECTIONAL
            to_light = jnp.where(is_dir, -scene.light_dir[li],
                                 normalize(scene.light_pos[li] - p))
            dist = jnp.linalg.norm(scene.light_pos[li] - p, axis=-1)
            tmax = jnp.where(is_dir, scene.camera.far_z,
                             dist - jnp.float32(self.cfg["pointLightClip"]))
            tmin = scene.camera.near_z * 0.1
            import jax as _jax
            if _jax.devices()[0].platform != "cpu":
                # 8x32-tile ray order -> tight per-block AABBs in the
                # streaming kernel (ops/rt_pallas.py tile_flatten)
                from ..ops import rt_pallas as _rp
                dirs_hw = jnp.broadcast_to(to_light, p.shape)
                pt, _ = _rp.pad_tile(p)
                dt, _ = _rp.pad_tile(dirs_hw)
                xt, _ = _rp.pad_tile(tmax, fill=-1.0)
                ph = h + (-h) % _rp.TILE_RH
                pw = w + (-w) % _rp.TILE_RW
                hit_t = _rp.any_hit_pallas(
                    scene, _rp.tile_flatten(pt), _rp.tile_flatten(dt),
                    jnp.broadcast_to(tmin, (ph * pw,)),
                    _rp.tile_flatten(xt))
                hit = _rp.tile_unflatten(hit_t, ph, pw)[:h, :w]
            else:
                origins = p.reshape(-1, 3)
                dirs = jnp.broadcast_to(to_light, p.shape).reshape(-1, 3)
                hit = rt.any_hit(scene, origins, dirs,
                                 jnp.broadcast_to(tmin, (h * w,)),
                                 tmax.reshape(-1)).reshape(h, w)
            vis = jnp.where(hit, 0.0, 1.0)
            # backfacing surfaces are occluded (RayShadow.ps.slang:178)
            facing = jnp.sum(jnp.broadcast_to(to_light, n.shape) * n, -1) > 0.0
            vis = jnp.where(facing, vis, 0.0)
            vis = jnp.where(valid, vis, 1.0)
            vis_slices.append(vis)
        if not vis_slices:
            vis_slices = [jnp.ones((h, w), jnp.float32)]
        return {"visibility": jnp.stack(vis_slices, axis=0)}, None


def _shade(scene, g, visibility, env_color, ambient_intensity, env_intensity,
           light_intensity):
    """Shared shading core of Forward/Deferred lighting
    (ForwardLighting.3d.slang:34-90, simplified to the Lambert+ambient terms
    our material model carries)."""
    hit = g["posW"][..., 3] > 0.0
    mid = jnp.maximum(g["mtlData"], 0)
    albedo = scene.mat_base_color[mid]
    emissive = scene.mat_emissive[mid]
    if scene.tex_pages is not None and g.get("texC") is not None:
        # one bilinear fetch per pixel, shading pass only (textures.py rules)
        from ..scene.textures import sample_pages
        albedo = albedo * sample_pages(scene.tex_pages, scene.mat_tex[mid],
                                       g["texC"])
    n = g["normW"][..., :3]
    p = g["posW"][..., :3]

    color = emissive + ambient_intensity * albedo
    color = color + env_intensity * albedo * scene.env_radiance

    for li in range(int(scene.num_lights)):
        is_dir = scene.light_type[li] == LIGHT_DIRECTIONAL
        to_light = jnp.where(is_dir, -scene.light_dir[li],
                             normalize(scene.light_pos[li] - p))
        dist2 = jnp.sum((scene.light_pos[li] - p) ** 2, -1)
        li_rad = jnp.where(is_dir, scene.light_intensity[li],
                           scene.light_intensity[li] / jnp.maximum(dist2, 1e-4)[..., None])
        ndotl = saturate(jnp.sum(n * to_light, -1))
        shadow = visibility[li] if (visibility is not None and li < visibility.shape[0]) else 1.0
        color = color + (shadow * ndotl)[..., None] * albedo / 3.14159265 * li_rad * light_intensity

    return jnp.where(hit[..., None], color, env_color)


@register_pass("ForwardLighting")
class ForwardLighting(RenderPass):
    SCHEMA = dict(envMapIntensity=0.25, ambientIntensity=0.25,
                  lightIntensity=0.5, envMapMirror=False, maxPerTile=256)

    def reflect(self, ctx):
        return (PassReflection().add_input("depth").add_input("color")
                .add_input("visibilityBuffer", optional=True)
                .add_output("color"))

    def execute(self, ctx, inputs, state=None):
        g = raster_gbuffer(ctx.scene, ctx.width, ctx.height,
                           max_per_tile=int(self.cfg["maxPerTile"]))
        color = _shade(ctx.scene, g, inputs.get("visibilityBuffer"),
                       inputs["color"],
                       float(self.cfg["ambientIntensity"]),
                       float(self.cfg["envMapIntensity"]),
                       float(self.cfg["lightIntensity"]))
        return {"color": color}, None


@register_pass("DeferredLighting")
class DeferredLighting(RenderPass):
    """Deferred variant (reference Source/RenderPasses/DeferredLighting/):
    shades from explicit G-buffer inputs instead of re-rasterizing."""

    SCHEMA = dict(envMapIntensity=0.25, ambientIntensity=0.25,
                  lightIntensity=0.5)

    def reflect(self, ctx):
        return (PassReflection().add_input("posW").add_input("normW")
                .add_input("mtlData").add_input("color")
                .add_input("texC", optional=True)
                .add_input("visibilityBuffer", optional=True)
                .add_output("color"))

    def execute(self, ctx, inputs, state=None):
        g = {"posW": inputs["posW"], "normW": inputs["normW"],
             "mtlData": inputs["mtlData"], "texC": inputs.get("texC")}
        color = _shade(ctx.scene, g, inputs.get("visibilityBuffer"),
                       inputs["color"],
                       float(self.cfg["ambientIntensity"]),
                       float(self.cfg["envMapIntensity"]),
                       float(self.cfg["lightIntensity"]))
        return {"color": color}, None
