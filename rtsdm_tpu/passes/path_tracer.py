"""MinimalPathTracer (reference Source/RenderPasses/MinimalPathTracer/ —
a brute-force unidirectional path tracer with analytic-light NEE, used for
ground-truth comparisons together with AccumulatePass).

TPU design: fixed-depth wavefront — every bounce is a full-screen batch of
rays through the shared chunked intersection kernels (no divergence), with
per-frame decorrelated hashing; converges under AccumulatePass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rt
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..scene.scene import LIGHT_DIRECTIONAL
from ..utils.math import normalize, saturate


def _hash_u32(x):
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x + (x << 3)                       # uint32 wraps
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    return x ^ (x >> 15)


def _rand01(seed):
    return (_hash_u32(seed) & jnp.uint32(0xFFFFFF)).astype(jnp.float32) \
        / float(1 << 24)


def _cosine_dir(n, u1, u2):
    r = jnp.sqrt(u1)
    phi = 2.0 * 3.14159265 * u2
    helper = jnp.where(jnp.abs(n[..., 0:1]) > 0.9,
                       jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t = normalize(jnp.cross(n, helper))
    b = jnp.cross(n, t)
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                       jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))], -1)
    return normalize(t * local[..., 0:1] + b * local[..., 1:2] + n * local[..., 2:3])


@register_pass("MinimalPathTracer")
class MinimalPathTracer(RenderPass):
    SCHEMA = dict(maxBounces=2, computeDirect=True, useImportanceSampling=True,
                  chunk=256)

    def reflect(self, ctx):
        return (PassReflection().add_input("vbuffer", optional=True)
                .add_output("color"))

    def execute(self, ctx, inputs, state=None):
        scene = ctx.scene
        cam = scene.camera
        h, w = ctx.height, ctx.width
        chunk = int(self.cfg["chunk"])
        fi = jnp.uint32(ctx.frame_index)

        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        origin, dirs = cam.compute_ray_pinhole(px, (w, h))
        o = jnp.broadcast_to(origin, (h * w, 3))
        d = dirs.reshape(-1, 3)

        pid = (jnp.arange(h * w, dtype=jnp.uint32) * 9781 + fi * 6271)
        radiance = jnp.zeros((h * w, 3))
        throughput = jnp.ones((h * w, 3))
        alive = jnp.ones((h * w,), bool)

        face_n = scene.face_normals()
        for bounce in range(int(self.cfg["maxBounces"]) + 1):
            t, tid = rt.closest_hit(scene, o, d,
                                    jnp.full((h * w,), 1e-3),
                                    jnp.broadcast_to(cam.far_z, (h * w,)),
                                    chunk=chunk)
            hit = (tid >= 0) & alive
            # environment on miss
            radiance = radiance + jnp.where((~hit & alive)[..., None],
                                            throughput * scene.env_radiance, 0.0)
            mid = jnp.maximum(scene.material_id[jnp.maximum(tid, 0)], 0)
            albedo = scene.mat_base_color[mid]
            emissive = scene.mat_emissive[mid]
            radiance = radiance + jnp.where(hit[..., None],
                                            throughput * emissive, 0.0)

            p = o + d * t[..., None]
            n = face_n[jnp.maximum(tid, 0)]
            n = jnp.where((jnp.sum(n * d, -1) > 0)[..., None], -n, n)

            # NEE toward each analytic light (MinimalPathTracer direct term)
            if self.cfg["computeDirect"]:
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
                    contrib = throughput * albedo / 3.14159265 \
                        * (ndotl * (~occ))[..., None] * li_rad
                    radiance = radiance + jnp.where(hit[..., None], contrib, 0.0)

            if bounce == int(self.cfg["maxBounces"]):
                break
            # cosine-hemisphere bounce (importance-sampled: brdf*cos/pdf = albedo)
            u1 = _rand01(pid * 3 + jnp.uint32(bounce * 2 + 1))
            u2 = _rand01(pid * 3 + jnp.uint32(bounce * 2 + 2))
            d = _cosine_dir(n, u1, u2)
            o = p + n * 1e-3
            throughput = throughput * jnp.where(hit[..., None], albedo, 0.0)
            alive = hit

        return {"color": radiance.reshape(h, w, 3)}, None
