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

from ..ops import lights, rt
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


def _env_radiance(scene, d):
    """Miss radiance: lat-long env texture when present, constant otherwise
    (ref Scene/Lights/EnvMap.cpp eval)."""
    if scene.env_map is None:
        return scene.env_radiance
    from ..scene.textures import sample_env
    return sample_env(scene.env_map, d) * scene.env_radiance


def _textured_albedo(scene, mid, tid, p, albedo):
    """Base color modulated by the material texture at the hit point —
    one bilinear fetch per ray, shading side only (scene/textures.py)."""
    if scene.tex_pages is None:
        return albedo
    from ..scene.textures import sample_pages
    return albedo * sample_pages(scene.tex_pages, scene.mat_tex[mid],
                                 scene.hit_uv(tid, p))


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
                                            throughput * _env_radiance(scene, d),
                                            0.0)
            mid = jnp.maximum(scene.material_id[jnp.maximum(tid, 0)], 0)
            albedo = scene.mat_base_color[mid]
            emissive = scene.mat_emissive[mid]
            radiance = radiance + jnp.where(hit[..., None],
                                            throughput * emissive, 0.0)

            p = o + d * t[..., None]
            albedo = _textured_albedo(scene, mid, tid, p, albedo)
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


# ---------------------------------------------------------------------------
# Full PathTracer (reference Source/RenderPasses/PathTracer/, 4.8k LoC):
# NEE over analytic lights + area-sampled emissive triangles, diffuse+GGX
# BSDF importance sampling, MIS (balance heuristic) between the two
# estimators, Russian roulette. Wavefront formulation: each bounce is one
# full-screen batch through the shared chunked intersection kernels.
# ---------------------------------------------------------------------------

from ..ops.brdf import fresnel_schlick as _fresnel
from ..ops.brdf import ggx_d as _ggx_d
from ..ops.brdf import smith_g as _smith_g

_PI = 3.14159265


def _eval_bsdf(albedo, rough, n, wo, wi):
    """(f * cos, pdf_bsdf) for the diffuse+GGX model under the sampling
    strategy of _sample_bsdf (lobe pick by p_spec, cosine diffuse, NDF GGX)."""
    n_dot_l = jnp.sum(n * wi, -1)
    n_dot_v = jnp.maximum(jnp.sum(n * wo, -1), 1e-4)
    h = normalize(wo + wi)
    n_dot_h = saturate(jnp.sum(n * h, -1))
    v_dot_h = saturate(jnp.sum(wo * h, -1))
    alpha = jnp.maximum(rough * rough, 1e-3)

    valid = n_dot_l > 1e-5
    f = _fresnel(v_dot_h)
    d = _ggx_d(n_dot_h, alpha)
    g = _smith_g(n_dot_v, n_dot_l, alpha)
    spec = (f * d * g / jnp.maximum(4.0 * n_dot_v * n_dot_l, 1e-6))[..., None]
    diff = albedo / _PI
    f_cos = jnp.where(valid[..., None], (diff + spec) * n_dot_l[..., None], 0.0)

    p_spec = _p_spec(albedo)
    pdf_diff = n_dot_l / _PI
    pdf_spec = d * n_dot_h / jnp.maximum(4.0 * v_dot_h, 1e-6)
    pdf = jnp.where(valid,
                    (1.0 - p_spec) * pdf_diff + p_spec * pdf_spec, 0.0)
    return f_cos, pdf


def _p_spec(albedo):
    """Specular lobe selection probability from relative lobe albedos."""
    lum = (albedo[..., 0] + albedo[..., 1] + albedo[..., 2]) / 3.0
    return jnp.clip(0.04 / jnp.maximum(0.04 + lum, 1e-4), 0.05, 0.9)


def _sample_bsdf(albedo, rough, n, wo, u1, u2, u3):
    """Sample wi; returns (wi, picked_spec)."""
    alpha = jnp.maximum(rough * rough, 1e-3)
    helper = jnp.where(jnp.abs(n[..., 0:1]) > 0.9,
                       jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t = normalize(jnp.cross(n, helper))
    b = jnp.cross(n, t)

    # diffuse: cosine hemisphere
    r = jnp.sqrt(u1)
    phi = 2.0 * _PI * u2
    ld = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))], -1)
    wi_diff = normalize(t * ld[..., 0:1] + b * ld[..., 1:2] + n * ld[..., 2:3])

    # specular: sample the GGX NDF half-vector, reflect
    ct = jnp.sqrt((1.0 - u1) / jnp.maximum(1.0 + (alpha * alpha - 1.0) * u1,
                                           1e-8))
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    hl = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    hw = normalize(t * hl[..., 0:1] + b * hl[..., 1:2] + n * ct[..., None])
    wi_spec = normalize(2.0 * jnp.sum(wo * hw, -1, keepdims=True) * hw - wo)

    pick_spec = u3 < _p_spec(albedo)
    wi = jnp.where(pick_spec[..., None], wi_spec, wi_diff)
    return wi, pick_spec


@register_pass("PathTracer")
class PathTracer(RenderPass):
    """Reference parity at this material model's scale: samplesPerPixel,
    maxSurfaceBounces, NEE + MIS over analytic lights and area-sampled
    emissive triangles (the LightBVH's role at our scene scale —
    Rendering/Lights/EmissivePowerSampler), Russian roulette
    (PathTracer.cpp kRussianRoulette)."""

    SCHEMA = dict(samplesPerPixel=1, maxSurfaceBounces=3, useNEE=True,
                  useMIS=True, useRussianRoulette=True, rrDepth=2,
                  chunk=256, useImportanceSampling=True,
                  emissiveSampler="Power")  # "Power" | "LightBVH"

    def __init__(self, props=None):
        super().__init__(props)
        self._emissive = None
        self._clusters = None

    def set_scene(self, scene):
        super().set_scene(scene)
        # flat EmissivePowerSampler tables (ops/lights.py; reference
        # Rendering/Lights/EmissivePowerSampler.cpp)
        self._emissive = lights.build_power_sampler(scene)
        # the clustered LightBVH analogue (ops/lights.py; reference
        # Rendering/Lights/LightBVH.h:57) — built only when selected
        if self.cfg["emissiveSampler"] == "LightBVH":
            self._clusters = lights.build_cluster_sampler(scene)
        else:
            self._clusters = None

    def reflect(self, ctx):
        r = (PassReflection().add_input("vbuffer", optional=True)
             .add_input("viewW", optional=True)
             .add_input("mvec", optional=True)
             .add_output("color"))
        for c in ["nrdEmission", "nrdDiffuseReflectance",
                  "nrdSpecularReflectance", "nrdDiffuseRadianceHitDist",
                  "nrdSpecularRadianceHitDist", "nrdResidualRadianceHitDist",
                  "nrdDeltaReflectionRadianceHitDist",
                  "nrdDeltaReflectionEmission",
                  "nrdDeltaReflectionReflectance",
                  "nrdDeltaReflectionNormWRoughMaterialID",
                  "nrdDeltaReflectionPathLength", "nrdDeltaReflectionHitDist",
                  "nrdDeltaTransmissionRadianceHitDist",
                  "nrdDeltaTransmissionEmission",
                  "nrdDeltaTransmissionReflectance",
                  "nrdDeltaTransmissionNormWRoughMaterialID",
                  "nrdDeltaTransmissionPathLength",
                  "nrdDeltaTransmissionPosW"]:
            r.add_output(c, optional=True)
        return r

    # --- emissive light sampling --------------------------------------------
    def _active_clusters(self):
        """The clustered sampler iff cfg SAYS so — dispatching on
        `_clusters is not None` alone goes stale when emissiveSampler is
        edited after set_scene (apply_ui/retrace path); the tables are
        (re)built lazily from the concrete scene at trace time."""
        if self.cfg["emissiveSampler"] != "LightBVH":
            return None
        if self._clusters is None and self.scene is not None:
            self._clusters = lights.build_cluster_sampler(self.scene)
        return self._clusters

    def _sample_emissive(self, scene, p, u1, u2, u3, u4):
        """One emissive light sample per point: returns (dir, dist, Le,
        pdf_solid_angle, valid, tid).  Dispatches to the clustered LightBVH
        analogue when selected, else the flat power CDF."""
        cl = self._active_clusters()
        if cl is not None:
            return lights.sample_clustered(cl, scene, p, u1, u2, u3, u4)
        em = self._emissive
        idx = jnp.searchsorted(em["cdf"], u1)
        idx = jnp.clip(idx, 0, em["ids"].shape[0] - 1)
        tid = em["ids"][idx]
        tri = scene.positions[tid]
        su = jnp.sqrt(u2)
        b1 = 1.0 - su
        b2 = u3 * su
        q = (tri[..., 0, :] * (1.0 - b1 - b2)[..., None]
             + tri[..., 1, :] * b1[..., None] + tri[..., 2, :] * b2[..., None])
        e1 = tri[..., 1, :] - tri[..., 0, :]
        e2 = tri[..., 2, :] - tri[..., 0, :]
        ln = jnp.cross(e1, e2)
        l_area = 0.5 * jnp.linalg.norm(ln, axis=-1)
        ln = ln / jnp.maximum(2.0 * l_area[..., None], 1e-8)
        to_q = q - p
        dist = jnp.linalg.norm(to_q, axis=-1)
        wi = to_q / jnp.maximum(dist[..., None], 1e-8)
        cos_l = jnp.abs(jnp.sum(ln * wi, -1))
        le = scene.mat_emissive[scene.material_id[tid]]
        # power-weighted area pdf -> solid angle (EmissivePowerSampler)
        pdf_w = (dist * dist) * em["pdf_area"][idx] / jnp.maximum(cos_l, 1e-8)
        valid = (cos_l > 1e-4) & (dist > 1e-4)
        return wi, dist, le, pdf_w, valid, tid

    def _emissive_pdf_w(self, scene, p, wi, t, tid):
        """pdf of having NEE-sampled the emissive hit (for MIS on BSDF hits)."""
        cl = self._active_clusters()
        if cl is not None:
            return lights.pdf_clustered_w(cl, scene, p, wi, t, tid)
        em = self._emissive
        tri = scene.positions[jnp.maximum(tid, 0)]
        e1 = tri[..., 1, :] - tri[..., 0, :]
        e2 = tri[..., 2, :] - tri[..., 0, :]
        ln = jnp.cross(e1, e2)
        a2 = jnp.linalg.norm(ln, axis=-1)
        cos_l = jnp.abs(jnp.sum(ln * wi, -1)) / jnp.maximum(a2, 1e-8)
        pdf_area = em["pdf_area_by_tid"][jnp.maximum(tid, 0)]
        return (t * t) * pdf_area / jnp.maximum(cos_l, 1e-8)

    # ------------------------------------------------------------------------
    def execute(self, ctx, inputs, state=None):
        scene = ctx.scene
        cam = scene.camera
        h, w = ctx.height, ctx.width
        chunk = int(self.cfg["chunk"])
        spp = int(self.cfg["samplesPerPixel"])
        fi = jnp.uint32(ctx.frame_index)
        face_n = scene.face_normals()
        r = h * w

        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        origin, prim_d = cam.compute_ray_pinhole(px, (w, h))
        prim_o = jnp.broadcast_to(origin, (r, 3))
        prim_d = prim_d.reshape(-1, 3)

        total = jnp.zeros((r, 3))
        for s in range(spp):
            total = total + self._trace_sample(
                scene, cam, prim_o, prim_d, face_n, r, chunk,
                fi * jnp.uint32(spp) + jnp.uint32(s),
                inputs.get("vbuffer"))
        color = (total / spp).reshape(h, w, 3)
        out = {"color": color}
        # the NRD channel set re-traces primary visibility when no vbuffer
        # is wired — skip the whole block unless some nrd* output is
        # actually consumed (ctx.consumed_outputs None = standalone call,
        # produce everything)
        cons = getattr(ctx, "consumed_outputs", None)
        if cons is None or any(c.startswith("nrd") for c in cons):
            out.update(self._nrd_channels(scene, cam, prim_o, prim_d, face_n,
                                          chunk, inputs.get("vbuffer"),
                                          color, h, w))
        return out, None

    def _nrd_channels(self, scene, cam, o, d, face_n, chunk, vbuffer,
                      color, h, w):
        """NRD demodulation outputs (reference PathTracer kOutputNRD*
        channels, consumed by scripts/PathTracerNRD.py). The repo's BSDF has
        no delta lobes, so the delta-reflection/transmission families are
        legitimately zero; non-delta indirect light rides the diffuse
        radiance term and ModulateIllumination reconstructs
        emission + diffRefl*diffRad exactly."""
        from ..ops import brdf
        from ..ops.materials import fetch_shading_materials
        r = h * w
        if vbuffer is not None:
            tid = vbuffer[..., 0].reshape(-1).astype(jnp.int32)
            tri = scene.positions[jnp.maximum(tid, 0)]
            b1 = vbuffer[..., 1].reshape(-1)[..., None]
            b2 = vbuffer[..., 2].reshape(-1)[..., None]
            q = (tri[:, 0] * (1.0 - b1 - b2) + tri[:, 1] * b1 + tri[:, 2] * b2)
            t = jnp.linalg.norm(q - o, axis=-1)
        else:
            t, tid = rt.closest_hit(scene, o, d, jnp.full((r,), 1e-3),
                                    jnp.broadcast_to(cam.far_z, (r,)),
                                    chunk=chunk)
        hit = (tid >= 0).reshape(h, w)
        mid = jnp.maximum(scene.material_id[jnp.maximum(tid, 0)], 0)
        mat = fetch_shading_materials(scene, mid.reshape(h, w))
        diff_alb, f0 = brdf.metallic_albedos(mat["base_color"],
                                             mat["metallic"], mat["ior"])
        m3 = hit[..., None].astype(jnp.float32)
        emission = mat["emissive"] * m3
        diff_refl = diff_alb * m3
        spec_refl = f0 * m3
        hit_t = jnp.where(hit, t.reshape(h, w), 0.0)[..., None]
        diff_rad = (color - emission) / jnp.maximum(diff_refl, 1e-3) * m3
        z4 = jnp.zeros((h, w, 4))
        return {
            "nrdEmission": emission,
            "nrdDiffuseReflectance": diff_refl,
            "nrdSpecularReflectance": spec_refl,
            "nrdDiffuseRadianceHitDist": jnp.concatenate([diff_rad, hit_t], -1),
            "nrdSpecularRadianceHitDist": jnp.concatenate(
                [jnp.zeros((h, w, 3)), hit_t], -1),
            "nrdResidualRadianceHitDist": z4,
            "nrdDeltaReflectionRadianceHitDist": z4,
            "nrdDeltaReflectionEmission": jnp.zeros((h, w, 3)),
            "nrdDeltaReflectionReflectance": jnp.zeros((h, w, 3)),
            "nrdDeltaReflectionNormWRoughMaterialID": z4,
            "nrdDeltaReflectionPathLength": jnp.zeros((h, w)),
            "nrdDeltaReflectionHitDist": jnp.zeros((h, w)),
            "nrdDeltaTransmissionRadianceHitDist": z4,
            "nrdDeltaTransmissionEmission": jnp.zeros((h, w, 3)),
            "nrdDeltaTransmissionReflectance": jnp.zeros((h, w, 3)),
            "nrdDeltaTransmissionNormWRoughMaterialID": z4,
            "nrdDeltaTransmissionPathLength": jnp.zeros((h, w)),
            "nrdDeltaTransmissionPosW": jnp.zeros((h, w, 3)),
        }

    def _trace_sample(self, scene, cam, o, d, face_n, r, chunk, seed_base,
                      vbuffer):
        pid = (jnp.arange(r, dtype=jnp.uint32) * 9781
               + seed_base * jnp.uint32(6271))

        radiance = jnp.zeros((r, 3))
        throughput = jnp.ones((r, 3))
        alive = jnp.ones((r,), bool)
        bsdf_pdf_prev = jnp.full((r,), -1.0)  # <0: camera ray (no MIS)
        max_bounces = int(self.cfg["maxSurfaceBounces"])
        use_nee = bool(self.cfg["useNEE"]) and scene.num_lights > 0
        use_mis = bool(self.cfg["useMIS"]) and self._emissive is not None
        rr_depth = int(self.cfg["rrDepth"])

        for bounce in range(max_bounces + 1):
            if bounce == 0 and vbuffer is not None:
                tid = vbuffer[..., 0].reshape(-1).astype(jnp.int32)
                # primary hit distance from the vbuffer barycentrics
                tri = scene.positions[jnp.maximum(tid, 0)]
                b1 = vbuffer[..., 1].reshape(-1)[..., None]
                b2 = vbuffer[..., 2].reshape(-1)[..., None]
                q = (tri[:, 0] * (1.0 - b1 - b2) + tri[:, 1] * b1
                     + tri[:, 2] * b2)
                t = jnp.linalg.norm(q - o, axis=-1)
            else:
                t, tid = rt.closest_hit(scene, o, d, jnp.full((r,), 1e-3),
                                        jnp.broadcast_to(cam.far_z, (r,)),
                                        chunk=chunk)
            hit = (tid >= 0) & alive
            radiance = radiance + jnp.where(
                (~hit & alive)[..., None],
                throughput * _env_radiance(scene, d), 0.0)

            mid = jnp.maximum(scene.material_id[jnp.maximum(tid, 0)], 0)
            albedo = scene.mat_base_color[mid]
            rough = scene.mat_roughness[mid]
            emissive = scene.mat_emissive[mid]

            # emissive hit: MIS-weight against the NEE estimator that could
            # also have sampled this light (PathTracer MIS, balance heuristic)
            is_emissive = emissive.sum(-1) > 0.0
            if use_mis:
                pdf_nee = self._emissive_pdf_w(scene, o, d, t, tid)
                w_mis = jnp.where(bsdf_pdf_prev < 0.0, 1.0,
                                  bsdf_pdf_prev / jnp.maximum(
                                      bsdf_pdf_prev + pdf_nee, 1e-8))
                w_mis = jnp.where(is_emissive, w_mis, 1.0)
            elif use_nee and self._emissive is not None:
                # NEE on without MIS: NEE already samples these emitters at
                # full weight, so emissive BSDF-path hits on non-primary
                # bounces must be dropped (the reference skips them too) —
                # keeping both double-counts emissive lighting
                w_mis = jnp.where(bsdf_pdf_prev < 0.0, 1.0, 0.0)
            else:
                w_mis = jnp.ones((r,))
            radiance = radiance + jnp.where(
                hit[..., None], throughput * emissive * w_mis[..., None], 0.0)

            p = o + d * t[..., None]
            albedo = _textured_albedo(scene, mid, tid, p, albedo)
            n = face_n[jnp.maximum(tid, 0)]
            n = jnp.where((jnp.sum(n * d, -1) > 0)[..., None], -n, n)
            wo = -d

            if use_nee:
                # analytic delta lights (no MIS possible)
                for li in range(int(scene.num_lights)):
                    is_dir = scene.light_type[li] == LIGHT_DIRECTIONAL
                    to_l = jnp.where(is_dir, -scene.light_dir[li],
                                     normalize(scene.light_pos[li] - p))
                    dist = jnp.linalg.norm(scene.light_pos[li] - p, axis=-1)
                    tmax = jnp.where(is_dir, cam.far_z, dist - 1e-3)
                    occ = rt.any_hit(scene, p + n * 1e-3, to_l,
                                     jnp.full((r,), 1e-3), tmax, chunk=chunk)
                    li_rad = jnp.where(is_dir, scene.light_intensity[li],
                                       scene.light_intensity[li]
                                       / jnp.maximum(dist * dist, 1e-4)[..., None])
                    f_cos, _ = _eval_bsdf(albedo, rough, n, wo, to_l)
                    contrib = throughput * f_cos * (~occ)[..., None] * li_rad
                    radiance = radiance + jnp.where(hit[..., None], contrib, 0.0)

                # emissive triangle NEE with MIS
                if self._emissive is not None:
                    u = [_rand01(pid * 7 + jnp.uint32(bounce * 5 + k))
                         for k in range(4)]
                    wi_l, dist_l, le, pdf_l, lvalid, ltid = \
                        self._sample_emissive(scene, p, u[0], u[1], u[2], u[3])
                    occ = rt.any_hit(scene, p + n * 1e-3, wi_l,
                                     jnp.full((r,), 1e-3), dist_l - 1e-3,
                                     chunk=chunk)
                    f_cos, pdf_b = _eval_bsdf(albedo, rough, n, wo, wi_l)
                    if use_mis:
                        w_nee = pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-8)
                    else:
                        w_nee = jnp.ones((r,))
                    contrib = throughput * f_cos * le \
                        * (w_nee / jnp.maximum(pdf_l, 1e-8))[..., None]
                    ok = hit & lvalid & ~occ
                    radiance = radiance + jnp.where(ok[..., None], contrib, 0.0)

            if bounce == max_bounces:
                break

            u1 = _rand01(pid * 11 + jnp.uint32(bounce * 4 + 1))
            u2 = _rand01(pid * 11 + jnp.uint32(bounce * 4 + 2))
            u3 = _rand01(pid * 11 + jnp.uint32(bounce * 4 + 3))
            wi, _ = _sample_bsdf(albedo, rough, n, wo, u1, u2, u3)
            f_cos, pdf = _eval_bsdf(albedo, rough, n, wo, wi)
            weight = f_cos / jnp.maximum(pdf, 1e-8)[..., None]
            throughput = throughput * jnp.where(hit[..., None], weight, 0.0)
            bsdf_pdf_prev = pdf

            if self.cfg["useRussianRoulette"] and bounce >= rr_depth:
                tp_max = jnp.max(throughput, -1)
                p_survive = jnp.clip(tp_max, 0.05, 1.0)
                u_rr = _rand01(pid * 13 + jnp.uint32(bounce + 17))
                alive = hit & (u_rr < p_survive)
                throughput = throughput / p_survive[..., None]
            else:
                alive = hit
            o = p + n * 1e-3
            d = wi

        return radiance
