"""NRD denoiser slot — a real spatiotemporal filter behind the vendor name.

The reference wraps NVIDIA's NRD SDK (Source/RenderPasses/NRDPass/
NRDPass.cpp:1 — ReLAX/ReBLUR methods over demodulated radiance+hitDist
channels). The SDK is a vendor binary with no TPU equivalent, so this pass
runs the repo's SVGF-grade spatiotemporal core (passes/svgf.py svgf_filter:
temporal reprojection + variance-guided edge-stopping a-trous wavelet) over
every wired `*RadianceHitDist` channel — the same estimator family ReLAX
descends from. Upstream scripts (reference scripts/PathTracerNRD.py:17-27)
instantiate it under the short name "NRD" with per-instance method configs;
all of those configs map onto the filter parameters below.

Method mapping:
  RelaxDiffuseSpecular / RelaxDiffuse  -> svgf_filter per radiance channel
  SpecularReflectionMv / SpecularDeltaMv -> motion-vector passthrough (the
      SDK computes virtual-world reflection/delta motion; the surface motion
      vector is the zero-parallax approximation of both)

Config mapping (reference NRDPass.cpp serialized properties):
  maxIntensity          -> input radiance clamp before filtering
  disocclusionThreshold -> relative-depth reprojection reject (percent)
  spatialVarianceEstimationHistoryThreshold -> history length below which
                           variance falls back to the spatial estimate
  enableReprojectionTestSkippingWithoutMotion -> static pixels keep history
                           even when the surface tests fail
  worldSpaceMotion      -> mvec is world-space (mvecW): reprojection runs at
                           zero screen motion and relies on the surface tests
                           (exact for static views; degrades to the spatial
                           filter under camera motion)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from .svgf import svgf_filter, svgf_init_state

_MV_METHODS = ("SpecularReflectionMv", "SpecularDeltaMv")


def _is_radiance(name: str) -> bool:
    return name.lower().endswith("radiancehitdist")


@register_pass("NRD")
class NRD(RenderPass):
    SCHEMA = dict(enabled=True, method="RelaxDiffuseSpecular",
                  maxIntensity=1000.0, worldSpaceMotion=True,
                  disocclusionThreshold=2.0,
                  enableReprojectionTestSkippingWithoutMotion=False,
                  spatialVarianceEstimationHistoryThreshold=3,
                  atrousIterations=4, phiLuminance=10.0, phiNormal=128.0,
                  alpha=0.05, momentsAlpha=0.2)

    def reflect(self, ctx):
        r = PassReflection()
        for c in ["diffuseRadianceHitDist", "specularRadianceHitDist",
                  "deltaReflectionRadianceHitDist",
                  "deltaTransmissionRadianceHitDist", "radianceHitdist",
                  "mvec", "normWRoughnessMaterialID", "linearZ", "viewZ",
                  "specularHitDist", "deltaReflectionHitDist",
                  "deltaTransmissionHitDist", "deltaTransmissionPosW",
                  "deltaPrimaryPosW", "deltaSecondaryPosW", "posW",
                  "motionVectors"]:
            r.add_input(c, optional=True)
        for c in ["filteredDiffuseRadianceHitDist",
                  "filteredSpecularRadianceHitDist",
                  "filteredDeltaReflectionRadianceHitDist",
                  "filteredDeltaTransmissionRadianceHitDist",
                  "filteredRadianceHitDist", "reflectionMvec",
                  "deltaMvec"]:
            r.add_output(c, optional=True)
        return r

    def _guides(self, inputs):
        """Extract (normal, linear_z, uv_motion) guide fields, or None."""
        nrm = inputs.get("normWRoughnessMaterialID")
        z = inputs.get("viewZ", inputs.get("linearZ"))
        if nrm is None or z is None:
            return None
        n = nrm[..., :3]
        if z.ndim == 3:
            z = z[..., 0]
        h, w = z.shape
        mv = inputs.get("mvec", inputs.get("motionVectors"))
        if mv is None or bool(self.cfg["worldSpaceMotion"]) or \
                mv.shape[-1] < 2:
            uv_motion = jnp.zeros((h, w, 2))
        else:
            uv_motion = mv[..., :2]
        return n, jnp.maximum(z, 1e-4), uv_motion

    def execute(self, ctx, inputs, state=None):
        out = {}
        mv = inputs.get("mvec", inputs.get("motionVectors"))
        if mv is not None:
            out["reflectionMvec"] = mv
            out["deltaMvec"] = mv

        method = str(self.cfg["method"])
        guides = None if method in _MV_METHODS else self._guides(inputs)
        filt_keys = [k for k in sorted(inputs) if _is_radiance(k)] \
            if (guides is not None and self.cfg["enabled"]) else []
        if state is None and filt_keys:
            n = guides[0]
            state = {k: svgf_init_state(n.shape[0], n.shape[1])
                     for k in filt_keys}
        new_state = {}

        max_i = float(self.cfg["maxIntensity"])
        for k, v in inputs.items():
            name = "filtered" + k[0].upper() + k[1:]
            if k in filt_keys and v.ndim == 3 and v.shape[-1] >= 3:
                n, z, uv_motion = guides
                rgb = jnp.clip(v[..., :3], 0.0, max_i)
                filtered, ns = svgf_filter(
                    rgb, n, z, uv_motion, state[k],
                    iterations=int(self.cfg["atrousIterations"]),
                    phi_color=float(self.cfg["phiLuminance"]),
                    phi_normal=float(self.cfg["phiNormal"]),
                    alpha=float(self.cfg["alpha"]),
                    moments_alpha=float(self.cfg["momentsAlpha"]),
                    hist_threshold=float(
                        self.cfg["spatialVarianceEstimationHistoryThreshold"]),
                    depth_reject=max(
                        0.01 * float(self.cfg["disocclusionThreshold"]), 0.01),
                    skip_test_without_motion=bool(
                        self.cfg["enableReprojectionTestSkippingWithoutMotion"]))
                new_state[k] = ns
                out[name] = jnp.concatenate([filtered, v[..., 3:]], -1) \
                    if v.shape[-1] > 3 else filtered
            else:
                out[name] = v
        return out, (new_state or None)
