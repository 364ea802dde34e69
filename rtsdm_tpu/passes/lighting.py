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

        # scene AABB for shadow-segment clipping (a directional-light ray
        # otherwise carries tmax=far_z: its segment AABB spans the frustum,
        # overlaps every chunk, and the streaming kernel degrades to a
        # whole-scene walk per block — measured 15 s/frame at SunTemple-full)
        smin = jnp.min(scene.positions.reshape(-1, 3), axis=0)
        smax = jnp.max(scene.positions.reshape(-1, 3), axis=0)

        vis_slices = []
        for li in range(n_lights):
            is_dir = scene.light_type[li] == LIGHT_DIRECTIONAL
            to_light = jnp.where(is_dir, -scene.light_dir[li],
                                 normalize(scene.light_pos[li] - p))
            dist = jnp.linalg.norm(scene.light_pos[li] - p, axis=-1)
            tmax = jnp.where(is_dir, scene.camera.far_z,
                             dist - jnp.float32(self.cfg["pointLightClip"]))
            # slab-clip to the scene AABB exit
            inv = 1.0 / jnp.where(jnp.abs(to_light) < 1e-8, 1e-8, to_light)
            ta = (smin - p) * inv
            tb = (smax - p) * inv
            t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
            tmax = jnp.minimum(tmax, jnp.maximum(t_exit, 0.0) + 1e-3)
            # dead rays (background pixels, light-backfacing surfaces —
            # their visibility is fixed regardless of the trace) must not
            # extend the block segment AABBs: mark invalid via tmax=-1
            facing = jnp.sum(jnp.broadcast_to(to_light, n.shape) * n, -1) > 0.0
            tmax = jnp.where(valid & facing, tmax, -1.0)
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
            vis = jnp.where(facing, vis, 0.0)
            vis = jnp.where(valid, vis, 1.0)
            vis_slices.append(vis)
        if not vis_slices:
            vis_slices = [jnp.ones((h, w), jnp.float32)]
        return {"visibility": jnp.stack(vis_slices, axis=0)}, None


def shading_inputs(scene, g):
    """Per-pixel shading fields shared by the lighting passes and the
    ReSTIR reservoir path (ops/restir.py): StandardMaterial metallic
    workflow (StandardMaterial.h:68) resolved densely from the G-buffer."""
    from ..ops import brdf

    hit = g["posW"][..., 3] > 0.0
    mid = jnp.maximum(g["mtlData"], 0)
    # all material properties in ONE one-hot MXU matmul — six per-pixel
    # [M,*] table gathers cost ~20 ms each per 2M px (ops/materials.py)
    from ..ops.materials import fetch_shading_materials
    mat = fetch_shading_materials(scene, mid)
    albedo = mat["base_color"]
    if scene.tex_pages is not None and g.get("texC") is not None:
        # one bilinear fetch per pixel, shading pass only (textures.py rules)
        from ..scene.textures import sample_pages
        albedo = albedo * sample_pages(scene.tex_pages, mat["tex"],
                                       g["texC"])
    n = g["normW"][..., :3]
    p = g["posW"][..., :3]
    wo = normalize(scene.camera.pos_w - p)
    diff_albedo, f0 = brdf.metallic_albedos(albedo, mat["metallic"],
                                            mat["ior"])
    return dict(hit=hit, n=n, p=p, wo=wo, diff_albedo=diff_albedo, f0=f0,
                rough=mat["roughness"], emissive=mat["emissive"])


def _shade(scene, g, visibility, env_color, ambient_intensity, env_intensity,
           light_intensity, env_map_mirror=False, include_lights=True):
    """Shared shading core of Forward/Deferred lighting — the
    StandardMaterial-equivalent model (ForwardLighting.3d.slang:34-90:
    emission + ambient*diffuseAlbedo + env diffuse/specular terms + per-light
    full BSDF eval; material instance = StandardMaterial.h:68 metallic
    workflow via ops/brdf.py)."""
    from ..ops import brdf

    si = shading_inputs(scene, g)
    hit = si["hit"]
    n, p, wo = si["n"], si["p"], si["wo"]
    diff_albedo, f0, rough = si["diff_albedo"], si["f0"], si["rough"]

    color = si["emissive"] + ambient_intensity * diff_albedo

    # env terms (ForwardLighting.3d.slang:53-63): diffuse along the normal,
    # specular along the mirror direction capped by roughnessToIntensity
    if scene.env_map is not None:
        from ..scene.textures import sample_env
        r_dir = normalize(2.0 * jnp.sum(wo * n, -1, keepdims=True) * n - wo)
        env_n = sample_env(scene.env_map, n) * scene.env_radiance
        env_r = sample_env(scene.env_map, r_dir) * scene.env_radiance
    else:
        env_n = env_r = jnp.broadcast_to(scene.env_radiance, color.shape)
    color = color + env_intensity * diff_albedo * jnp.minimum(env_n, 1.0)
    spec_cap = saturate(1.0 / (rough + 0.1))[..., None]
    color = color + env_intensity * f0 * jnp.minimum(env_r, spec_cap)
    if env_map_mirror:
        fr = brdf.fresnel_schlick(
            jnp.maximum(jnp.sum(wo * n, -1), 0.0), 0.3)[..., None]
        color = color + jnp.where((rough < 0.08)[..., None],
                                  fr * env_r, 0.0)

    for li in range(int(scene.num_lights) if include_lights else 0):
        is_dir = scene.light_type[li] == LIGHT_DIRECTIONAL
        to_light = jnp.where(is_dir, -scene.light_dir[li],
                             normalize(scene.light_pos[li] - p))
        dist2 = jnp.sum((scene.light_pos[li] - p) ** 2, -1)
        li_rad = jnp.where(is_dir, scene.light_intensity[li],
                           scene.light_intensity[li] / jnp.maximum(dist2, 1e-4)[..., None])
        shadow = (visibility[li]
                  if (visibility is not None and li < visibility.shape[0])
                  else jnp.float32(1.0))
        f_cos = brdf.eval_lobes(diff_albedo, f0, rough, n, wo, to_light)
        color = color + shadow[..., None] * f_cos * li_rad * light_intensity

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
                       float(self.cfg["lightIntensity"]),
                       env_map_mirror=bool(self.cfg["envMapMirror"]))
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
