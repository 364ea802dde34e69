"""WhittedRayTracer (reference Source/RenderPasses/WhittedRayTracer/, 1,266
LoC): classic recursive ray tracing — direct lighting + perfect mirror
reflections up to a fixed depth.

TPU design: wavefront like MinimalPathTracer but with deterministic mirror
bounces weighted by a Fresnel-Schlick reflectance."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import rt
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..scene.scene import LIGHT_DIRECTIONAL
from ..utils.math import normalize, saturate


@register_pass("WhittedRayTracer")
class WhittedRayTracer(RenderPass):
    SCHEMA = dict(maxBounces=2, reflectance=0.25, chunk=256)

    def reflect(self, ctx):
        return (PassReflection().add_input("vbuffer", optional=True)
                .add_output("color"))

    def execute(self, ctx, inputs, state=None):
        scene = ctx.scene
        cam = scene.camera
        h, w = ctx.height, ctx.width
        chunk = int(self.cfg["chunk"])
        refl = float(self.cfg["reflectance"])

        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        origin, dirs = cam.compute_ray_pinhole(px, (w, h))
        o = jnp.broadcast_to(origin, (h * w, 3))
        d = dirs.reshape(-1, 3)

        radiance = jnp.zeros((h * w, 3))
        weight = jnp.ones((h * w, 1))
        alive = jnp.ones((h * w,), bool)
        face_n = scene.face_normals()

        for bounce in range(int(self.cfg["maxBounces"]) + 1):
            t, tid = rt.closest_hit(scene, o, d, jnp.full((h * w,), 1e-3),
                                    jnp.broadcast_to(cam.far_z, (h * w,)),
                                    chunk=chunk)
            hit = (tid >= 0) & alive
            radiance = radiance + jnp.where((~hit & alive)[..., None],
                                            weight * scene.env_radiance, 0.0)
            mid = jnp.maximum(scene.material_id[jnp.maximum(tid, 0)], 0)
            albedo = scene.mat_base_color[mid]
            emissive = scene.mat_emissive[mid]
            p = o + d * t[..., None]
            n = face_n[jnp.maximum(tid, 0)]
            n = jnp.where((jnp.sum(n * d, -1) > 0)[..., None], -n, n)

            direct = emissive
            for li in range(int(scene.num_lights)):
                is_dir = scene.light_type[li] == LIGHT_DIRECTIONAL
                to_l = jnp.where(is_dir, -scene.light_dir[li],
                                 normalize(scene.light_pos[li] - p))
                dist = jnp.linalg.norm(scene.light_pos[li] - p, axis=-1)
                tmax = jnp.where(is_dir, cam.far_z, dist - 1e-3)
                occ = rt.any_hit(scene, p + n * 1e-3, to_l,
                                 jnp.full((h * w,), 1e-3), tmax, chunk=chunk)
                ndotl = saturate(jnp.sum(n * to_l, -1))
                li_rad = jnp.where(is_dir, scene.light_intensity[li],
                                   scene.light_intensity[li]
                                   / jnp.maximum(dist * dist, 1e-4)[..., None])
                direct = direct + albedo / 3.14159265 \
                    * (ndotl * (~occ))[..., None] * li_rad
            radiance = radiance + jnp.where(hit[..., None],
                                            weight * (1.0 - refl) * direct, 0.0)
            if bounce == int(self.cfg["maxBounces"]):
                break
            # perfect mirror bounce, Schlick-weighted
            cos_i = -jnp.sum(d * n, -1, keepdims=True)
            fres = refl + (1.0 - refl) * (1.0 - saturate(cos_i)) ** 5
            d = normalize(d + 2.0 * cos_i * n)
            o = p + n * 1e-3
            weight = weight * jnp.where(hit[..., None], fres, 0.0)
            alive = hit

        return {"color": radiance.reshape(h, w, 3)}, None
