"""ToneMapper (reference Source/RenderPasses/ToneMapper/ — operator table in
ToneMapping.ps.slang: Linear/Reinhard/ReinhardModified/HejiHableAlu/
HableUc2/Aces)."""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import luminance, saturate


def _aces(color):
    # Narkowicz ACES fit (the reference uses the same ALU approximation)
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return (color * (a * color + b)) / (color * (c * color + d) + e)


def _reinhard(color):
    l = luminance(color)[..., None]
    return color / (1.0 + l)


@register_pass("ToneMapper")
class ToneMapper(RenderPass):
    SCHEMA = dict(outputSize="Default", useSceneMetadata=True,
                  exposureCompensation=0.0, autoExposure=False,
                  filmSpeed=100.0, whiteBalance=False, whitePoint=6500.0,
                  operator="Linear", clamp=False, whiteMaxLuminance=1.0,
                  whiteScale=11.2, fNumber=1.0, shutter=1.0,
                  exposureMode="AperturePriority")

    def reflect(self, ctx):
        return PassReflection().add_input("src").add_output("dst")

    def execute(self, ctx, inputs, state=None):
        c = inputs["src"][..., :3]
        c = c * (2.0 ** float(self.cfg["exposureCompensation"]))
        op = self.cfg["operator"]
        if op == "Aces":
            c = _aces(c)
        elif op == "Reinhard":
            c = _reinhard(c)
        # Linear: passthrough
        if self.cfg["clamp"]:
            c = saturate(c)
        return {"dst": c}, None
