"""Deliberate stubs for vendor/upstream extras that are out of the north-star
scope (SURVEY §7: "stubbed or skipped deliberately, not silently").

Each stub passes data through unchanged and logs once. The reference
counterparts are NVIDIA-vendor integrations (DLSS/NRD/OptiX/DirectML/RTXDI)
with no TPU equivalent; where a TPU-native analogue makes sense (e.g. a
learned upscaler on the MXU) it is future work, not silently faked.
"""
from __future__ import annotations

import logging

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass

log = logging.getLogger("rtsdm")


def _stub(name, inputs, output, extra_schema=None):
    class _Stub(RenderPass):
        SCHEMA = dict(enabled=True, **(extra_schema or {}))
        _warned = False

        def reflect(self, ctx):
            r = PassReflection()
            for i in inputs:
                r.add_input(i, optional=(i != inputs[0]))
            return r.add_output(output)

        def execute(self, ctx, ins, state=None):
            if not type(self)._warned:
                log.warning("%s is a deliberate pass-through stub "
                            "(vendor integration without TPU equivalent)", name)
                type(self)._warned = True
            return {output: ins[inputs[0]]}, None

    _Stub.__name__ = name
    return register_pass(name)(_Stub)


DLSSPass = _stub("DLSSPass", ["color", "mvec", "depth"], "output",
                 dict(outputSize="Default", profile="Balanced",
                      motionVectorScale="Relative", isHDR=True, sharpness=0.0,
                      exposure=0.0))
NRDPass = _stub("NRDPass", ["radiance", "mvec", "normal"], "filteredRadiance")


# NRD ("NRD" short name, NRDPass alias above) is no longer a stub: the
# denoiser slot runs a real SVGF-grade spatiotemporal filter — see nrd.py.
OptixDenoiser = _stub("OptixDenoiser", ["color", "albedo", "normal", "mvec"],
                      "output")
DirectML = _stub("DirectML", ["input"], "output")
# RTXDIPass is NOT a stub: it runs TPU-native ReSTIR reservoir resampling
# with temporal + spatial reuse (passes/rtxdi.py, ops/restir.py).
