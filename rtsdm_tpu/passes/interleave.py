"""4x4 de/interleaving (reference Source/RenderPasses/DeinterleaveTexture/
Deinterleave.slang and InterleaveTexture.ps.slang).

slice = (y%4)*4 + (x%4); quarter-res slice s holds full-res pixels
(4*qx + s%4, 4*qy + s/4). On TPU this is a pure reshape/transpose — kept for
numerical parity of the HBAO noise indexing (SURVEY §2.5)."""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


def deinterleave_4x4(tex):
    """[H,W] -> [16, H/4, W/4] (H,W padded up to multiples of 4 by edge clamp)."""
    h, w = tex.shape[:2]
    ph, pw = (-h) % 4, (-w) % 4
    if ph or pw:
        tex = jnp.pad(tex, ((0, ph), (0, pw)) + ((0, 0),) * (tex.ndim - 2),
                      mode="edge")
    qh, qw = tex.shape[0] // 4, tex.shape[1] // 4
    t = tex.reshape((qh, 4, qw, 4) + tex.shape[2:])
    t = jnp.moveaxis(t, (1, 3), (0, 1))            # [4(y),4(x),qh,qw,...]
    return t.reshape((16, qh, qw) + tex.shape[2:])


def interleave_4x4(slices, height, width):
    """[16, qh, qw] -> [H, W]."""
    qh, qw = slices.shape[1], slices.shape[2]
    t = slices.reshape((4, 4, qh, qw) + slices.shape[3:])
    t = jnp.moveaxis(t, (0, 1), (1, 3))            # [qh,4,qw,4,...]
    t = t.reshape((qh * 4, qw * 4) + slices.shape[3:])
    return t[:height, :width]


@register_pass("DeinterleaveTexture")
class DeinterleaveTexture(RenderPass):
    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection().add_input("texIn").add_output("texOut")

    def execute(self, ctx, inputs, state=None):
        return {"texOut": deinterleave_4x4(inputs["texIn"])}, None


@register_pass("InterleaveTexture")
class InterleaveTexture(RenderPass):
    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection().add_input("texIn").add_output("texOut")

    def execute(self, ctx, inputs, state=None):
        return {"texOut": interleave_4x4(inputs["texIn"], ctx.height, ctx.width)}, None
