"""Post-FX extras.

References: Source/RenderPasses/SimplePostFX (vignette/chromatic aberration/
bloom-lite/barrel distortion) and ModulateIllumination (recombines demodulated
illumination components — the NRD companion pass).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import saturate


@register_pass("SimplePostFX")
class SimplePostFX(RenderPass):
    SCHEMA = dict(enabled=True, wipe=0.0, bloomAmount=0.0,
                  vignetteAmount=0.0, chromaticAberrationAmount=0.0,
                  barrelDistortAmount=0.0, saturationCurve=(1.0, 1.0, 1.0),
                  colorOffset=(0.0, 0.0, 0.0), colorScale=(1.0, 1.0, 1.0))

    def reflect(self, ctx):
        return PassReflection().add_input("src").add_output("dst")

    def execute(self, ctx, inputs, state=None):
        x = inputs["src"][..., :3]
        if not self.cfg["enabled"]:
            return {"dst": x}, None
        h, w = x.shape[:2]
        yy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h - 0.5
        xx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w - 0.5
        r2 = xx * xx + yy * yy

        bloom = float(self.cfg["bloomAmount"])
        if bloom > 0.0:
            from .pipeline_misc import GaussianBlur  # reuse kernel helper
            from ..ops.ao import shift_axis_clamped
            bright = jnp.maximum(x - 0.8, 0.0)
            blur = bright
            for axis in (0, 1):
                acc = jnp.zeros_like(blur)
                for d in range(-4, 5):
                    acc = acc + shift_axis_clamped(blur, axis, d) / 9.0
                blur = acc
            x = x + bloom * blur

        vig = float(self.cfg["vignetteAmount"])
        if vig > 0.0:
            x = x * (1.0 - vig * jnp.clip(r2 * 2.0, 0.0, 1.0))[..., None]

        scale = jnp.asarray(self.cfg["colorScale"], jnp.float32)
        offset = jnp.asarray(self.cfg["colorOffset"], jnp.float32)
        x = x * scale + offset
        return {"dst": x}, None


@register_pass("ModulateIllumination")
class ModulateIllumination(RenderPass):
    """color = emission + albedo*(diffuseRadiance) + specRadiance (+residual)
    — the demodulated-illumination recombine (ModulateIllumination)."""

    SCHEMA = dict(useEmission=True, useDiffuseReflectance=True,
                  useDiffuseRadiance=True, useSpecularRadiance=True,
                  useResidualRadiance=True)

    def reflect(self, ctx):
        r = PassReflection()
        for c in ["emission", "diffuseReflectance", "diffuseRadiance",
                  "specularReflectance", "specularRadiance",
                  "residualRadiance", "deltaReflectionEmission",
                  "deltaReflectionReflectance", "deltaReflectionRadiance",
                  "deltaTransmissionEmission", "deltaTransmissionReflectance",
                  "deltaTransmissionRadiance"]:
            r.add_input(c, optional=True)
        return r.add_output("output")

    def execute(self, ctx, inputs, state=None):
        def get(name, default=0.0):
            v = inputs.get(name)
            return v[..., :3] if v is not None else default

        out = 0.0
        if self.cfg["useEmission"]:
            out = out + get("emission")
        if self.cfg["useDiffuseRadiance"]:
            d = get("diffuseRadiance")
            if self.cfg["useDiffuseReflectance"]:
                d = d * get("diffuseReflectance", 1.0)
            out = out + d
        if self.cfg["useSpecularRadiance"]:
            s = get("specularRadiance")
            refl = inputs.get("specularReflectance")
            if refl is not None:
                s = s * refl[..., :3]
            out = out + s
        # delta lobe recombines (ModulateIllumination.cpp delta terms);
        # zero-filled by the repo's path tracer (no delta BSDF lobes)
        for fam in ("deltaReflection", "deltaTransmission"):
            out = out + get(fam + "Emission")
            out = out + get(fam + "Radiance") * get(fam + "Reflectance", 1.0)
        if self.cfg["useResidualRadiance"]:
            out = out + get("residualRadiance")
        return {"output": out}, None
