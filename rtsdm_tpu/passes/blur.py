"""Depth-aware blurs.

CrossBilateralBlur: separable HBAO+-style bilateral blur with depth-slope
correction (reference CrossBilateralBlur/CrossBilateralBlur.ps.slang:28-88;
host chaining + guard-band scissor CrossBilateralBlur.cpp:132-148).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


def _gather_axis(a, axis, offset, lo, hi):
    # clamped shift (roll + edge fix) — NOT jnp.take: arbitrary gathers are
    # ~200x slower than shifts on TPU
    from ..ops.ao import shift_axis_clamped
    return shift_axis_clamped(a, axis, offset, lo, hi)


def cross_bilateral_blur_1d(ao, depth, axis, kernel_radius, better_slope,
                            lo, hi):
    """One separable direction of the reference blur (ps.slang:59-88).
    ao, depth: [H,W]; axis 1 = horizontal pass, 0 = vertical."""
    r = kernel_radius
    blur_sigma = (r + 1.0) * 0.5
    blur_falloff = 1.0 / (2.0 * blur_sigma * blur_sigma)
    sharpness = 16.0

    depth_c = depth
    ao_sum = ao
    w_sum = jnp.ones_like(ao)

    # slope estimate from the two immediate neighbors (ps.slang:80-82)
    slope_l = depth_c - _gather_axis(depth, axis, -1, lo, hi)
    slope_r = _gather_axis(depth, axis, +1, lo, hi) - depth_c
    min_slope = jnp.where(jnp.abs(slope_l) < jnp.abs(slope_r), slope_l, slope_r)

    for sign in (+1, -1):
        depth_slope = sign * min_slope
        prev_sample_depth = None
        for d in range(1, r + 1):
            s_ao = _gather_axis(ao, axis, sign * d, lo, hi)
            s_depth = _gather_axis(depth, axis, sign * d, lo, hi)
            if d == 1 and not better_slope:
                depth_slope = s_depth - depth_c
            sd = s_depth - depth_slope * d
            dz = jnp.abs(sd - depth_c) * sharpness
            dz = dz * 12.0 / jnp.maximum(depth_c, 1e-6)
            w = jnp.exp2(-(d * d) * blur_falloff - dz * dz)
            ao_sum = ao_sum + w * s_ao
            w_sum = w_sum + w
            prev_sample_depth = s_depth
        del prev_sample_depth
    return ao_sum / w_sum


@register_pass("CrossBilateralBlur")
class CrossBilateralBlur(RenderPass):
    SCHEMA = dict(kernelRadius=4, betterSlope=True)

    def reflect(self, ctx):
        return (PassReflection()
                .add_input("color").add_input("linear depth")
                .add_output("colorOut"))

    def execute(self, ctx, inputs, state=None):
        ao = inputs["color"]
        depth = inputs["linear depth"]
        multi = ao.ndim == 3
        r = int(self.cfg["kernelRadius"])
        better = bool(self.cfg["betterSlope"])
        g = ctx.guard_band
        lo_x, hi_x = g, ctx.width - g - 1
        lo_y, hi_y = g, ctx.height - g - 1

        def blur2d(a):
            a = cross_bilateral_blur_1d(a, depth, 1, r, better, lo_x, hi_x)
            a = cross_bilateral_blur_1d(a, depth, 0, r, better, lo_y, hi_y)
            return a

        if multi:
            out = jnp.stack([blur2d(ao[..., c]) for c in range(ao.shape[-1])], -1)
        else:
            out = blur2d(ao)
        return {"colorOut": out}, None
