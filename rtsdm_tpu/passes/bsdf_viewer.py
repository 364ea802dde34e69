"""BSDFViewer — visual BSDF inspection pass
(reference Source/RenderPasses/BSDFViewer/BSDFViewer.cs.slang).

Two viewer modes, as in the reference:
  * Material slice: the Burley (theta_h, theta_d) BSDF slice with origin in
    the lower-left corner (BSDFViewer.cs.slang:72-104, "same format as the
    slices in Burley et al. 2012").
  * Lit sphere: orthographic unit sphere shaded with a directional light
    (calculateSphereGeometry, BSDFViewer.cs.slang:112-160).

Pure per-pixel math on the material tables — no scene geometry, fully
vectorized (one [H,W] batch through the shared diffuse+GGX BSDF from
passes/path_tracer.py)."""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import normalize, saturate
from .path_tracer import _eval_bsdf

_PI = 3.14159265


@register_pass("BSDFViewer")
class BSDFViewer(RenderPass):
    SCHEMA = dict(materialID=0, viewerMode="Slice",  # "Slice" | "Sphere"
                  lightIntensity=1.0, lightDir=(0.0, -0.7, -0.7),
                  roughnessOverride=-1.0,
                  # material family: the reference viewer dispatches on the
                  # scene material's IMaterial type (HairChiang16.slang,
                  # ClothBRDF.slang); here the family is a viewer option
                  # evaluated through ops/bsdf_extra.py
                  # "Standard" | "Cloth" | "HairChiang16" | "MERL" |
                  # "PBRTDiffuse" | "PBRTConductor" | "PBRTDielectric"
                  # (measured + PBRT families: ops/bsdf_measured.py)
                  bsdf="Standard",
                  clothF0=(0.04, 0.04, 0.04),
                  hairSigmaA=(0.42, 0.7, 1.37), hairBetaM=0.3, hairBetaN=0.3,
                  hairH=0.3, hairAlpha=0.035,
                  merlPath="",  # empty -> procedural synthetic table
                  pbrtEta=(0.2, 0.92, 1.1), pbrtK=(3.9, 2.45, 2.14),  # gold
                  pbrtIoR=1.5)

    def reflect(self, ctx):
        return PassReflection().add_output("output")

    def _material(self, scene):
        mid = min(int(self.cfg["materialID"]),
                  int(scene.mat_base_color.shape[0]) - 1)
        albedo = scene.mat_base_color[mid]
        rough = scene.mat_roughness[mid]
        ro = float(self.cfg["roughnessOverride"])
        if ro >= 0.0:
            rough = jnp.float32(ro)
        return albedo, rough

    def execute(self, ctx, inputs, state=None):
        h, w = ctx.height, ctx.width
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        u, v = jnp.meshgrid(xs, ys, indexing="xy")
        albedo, rough = self._material(ctx.scene)
        albedo = jnp.broadcast_to(albedo, (h, w, 3))
        rough = jnp.broadcast_to(rough, (h, w))

        if str(self.cfg["viewerMode"]) == "Sphere":
            out = self._sphere(u, v, albedo, rough)
        else:
            out = self._slice(u, v, albedo, rough)
        return {"output": out}, None

    def _eval(self, albedo, rough, n, wo, wi):
        """Dispatch on the configured material family; all three return
        f*cos in world space."""
        fam = str(self.cfg["bsdf"])
        if fam == "Cloth":
            from ..ops.bsdf_extra import eval_cloth
            f0 = jnp.broadcast_to(
                jnp.asarray(self.cfg["clothF0"], jnp.float32), albedo.shape)
            return eval_cloth(albedo, f0, rough, n, wo, wi)
        if fam == "HairChiang16":
            from ..ops.bsdf_extra import eval_hair
            # fiber tangent: a stable world axis projected onto the surface
            up = jnp.asarray([0.0, 1.0, 0.0])
            t = normalize(jnp.cross(jnp.broadcast_to(up, n.shape), n)
                          + 1e-6)
            b = jnp.cross(n, t)

            def local(wv):
                return jnp.stack([jnp.sum(wv * t, -1), jnp.sum(wv * b, -1),
                                  jnp.sum(wv * n, -1)], -1)
            sigma_a = jnp.broadcast_to(
                jnp.asarray(self.cfg["hairSigmaA"], jnp.float32),
                albedo.shape)
            return eval_hair(sigma_a, float(self.cfg["hairBetaM"]),
                             float(self.cfg["hairBetaN"]), local(wo),
                             local(wi), h=float(self.cfg["hairH"]),
                             alpha=float(self.cfg["hairAlpha"]))
        if fam == "MERL":
            from ..ops import bsdf_measured as M
            if getattr(self, "_merl_table", None) is None:
                path = str(self.cfg["merlPath"])
                self._merl_table = (M.load_merl(path) if path
                                    else M.synthetic_merl())
            return M.eval_merl(self._merl_table, n, wo, wi)
        if fam == "PBRTDiffuse":
            from ..ops.bsdf_measured import eval_pbrt_diffuse
            return eval_pbrt_diffuse(albedo, n, wo, wi)
        if fam == "PBRTConductor":
            from ..ops.bsdf_measured import eval_pbrt_conductor
            eta = jnp.asarray(self.cfg["pbrtEta"], jnp.float32)
            k = jnp.asarray(self.cfg["pbrtK"], jnp.float32)
            return eval_pbrt_conductor(eta, k, rough, n, wo, wi)
        if fam == "PBRTDielectric":
            from ..ops.bsdf_measured import eval_pbrt_dielectric
            return eval_pbrt_dielectric(float(self.cfg["pbrtIoR"]), rough,
                                        n, wo, wi)
        f_cos, _ = _eval_bsdf(albedo, rough, n, wo, wi)
        return f_cos

    # -- Burley slice (calculateSliceGeometry) ------------------------------
    def _slice(self, u, v, albedo, rough):
        theta_h = u * (_PI / 2.0)
        theta_d = (1.0 - v) * (_PI / 2.0)
        # n = +Z; half vector in the xz-plane at theta_h from n
        n = jnp.asarray([0.0, 0.0, 1.0])
        sh, ch = jnp.sin(theta_h), jnp.cos(theta_h)
        hvec = jnp.stack([sh, jnp.zeros_like(sh), ch], -1)
        # wi/wo at +-theta_d around h (in the plane spanned by h and n x h)
        t = normalize(jnp.cross(jnp.broadcast_to(n, hvec.shape), hvec)
                      + 1e-12)
        b = jnp.cross(hvec, t)
        sd, cd = jnp.sin(theta_d)[..., None], jnp.cos(theta_d)[..., None]
        wi = normalize(hvec * cd + b * sd)
        wo = normalize(hvec * cd - b * sd)
        nb = jnp.broadcast_to(n, hvec.shape)
        f_cos = self._eval(albedo, rough, nb, wo, wi)
        n_dot_l = saturate(jnp.sum(nb * wi, -1))[..., None]
        f = f_cos / jnp.maximum(n_dot_l, 1e-6)  # show f, not f*cos
        valid = (jnp.sum(nb * wi, -1) > 0.0) & (jnp.sum(nb * wo, -1) > 0.0)
        return jnp.where(valid[..., None], f, 0.0)

    # -- lit sphere (calculateSphereGeometry, orthographic) -----------------
    def _sphere(self, u, v, albedo, rough):
        ndc_x = 2.0 * u - 1.0
        ndc_y = -2.0 * v + 1.0
        r2 = ndc_x * ndc_x + ndc_y * ndc_y
        on = r2 < 1.0
        nz = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
        n = jnp.stack([ndc_x, ndc_y, nz], -1)          # unit-sphere normal
        wo = jnp.asarray([0.0, 0.0, 1.0])
        wo = jnp.broadcast_to(wo, n.shape)
        ld = -normalize(jnp.asarray(self.cfg["lightDir"], jnp.float32))
        wi = jnp.broadcast_to(ld, n.shape)
        f_cos = self._eval(albedo, rough, n, wo, wi)
        li = jnp.float32(self.cfg["lightIntensity"])
        col = f_cos * li
        bg = jnp.full_like(col, 0.05)                  # evalBackground
        return jnp.where(on[..., None], col, bg)
