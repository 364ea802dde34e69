"""Debug/inspection passes + PixelDebug utility.

References:
  SceneDebugger (Source/RenderPasses/SceneDebugger/) — visualize G-buffer
    quantities (normals/depth/ids/uv...)
  PixelInspectorPass — numeric readout for one pixel
  Utils/Debug/PixelDebug.h:54-76 — shader print/assert; the JAX analogue is
    jax.debug.print gated on a pixel coordinate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


@register_pass("SceneDebugger")
class SceneDebugger(RenderPass):
    SCHEMA = dict(mode="FaceNormal")  # FaceNormal|ShadingNormal|Depth|MaterialID|TexCoords|MotionVectors

    def reflect(self, ctx):
        r = PassReflection()
        for c in ["depth", "normW", "faceNormalW", "texC", "mvec", "mtlData"]:
            r.add_input(c, optional=True)
        return r.add_output("output")

    def execute(self, ctx, inputs, state=None):
        if not inputs:
            # the reference SceneDebugger graph is the bare pass with no
            # wired inputs (scripts/SceneDebugger.py): it owns its V-buffer
            # and materializes what the selected mode needs — raster the
            # G-buffer internally
            from .gbuffer import raster_gbuffer
            inputs = raster_gbuffer(ctx.scene, ctx.width, ctx.height)
        mode = self.cfg["mode"]
        if mode == "Depth":
            d = ctx.scene.camera.linearize_depth(inputs["depth"])
            v = jnp.clip(d / ctx.scene.camera.far_z * 20.0, 0, 1)
            out = jnp.stack([v, v, v], -1)
        elif mode == "ShadingNormal":
            out = inputs["normW"][..., :3] * 0.5 + 0.5
        elif mode == "MaterialID":
            mid = inputs["mtlData"].astype(jnp.float32)
            out = jnp.stack([jnp.mod(mid * 0.61, 1.0), jnp.mod(mid * 0.37, 1.0),
                             jnp.mod(mid * 0.83, 1.0)], -1)
            out = jnp.where((inputs["mtlData"] >= 0)[..., None], out, 0.0)
        elif mode == "TexCoords":
            tc = inputs["texC"]
            out = jnp.stack([jnp.mod(tc[..., 0], 1.0), jnp.mod(tc[..., 1], 1.0),
                             jnp.zeros_like(tc[..., 0])], -1)
        elif mode == "MotionVectors":
            mv = inputs["mvec"][..., :2]
            out = jnp.concatenate([jnp.abs(mv) * 50.0,
                                   jnp.zeros_like(mv[..., :1])], -1)
        else:  # FaceNormal
            out = inputs["faceNormalW"][..., :3] * 0.5 + 0.5
        return {"output": jnp.clip(out, 0, 1)}, None


@register_pass("PixelInspectorPass")
class PixelInspectorPass(RenderPass):
    """Collects the wired channels' values at a chosen pixel; readable from
    host via .last after the frame (PixelInspectorPass semantics)."""

    SCHEMA = dict(x=0, y=0)

    def __init__(self, props=None):
        super().__init__(props)
        self.last = {}

    def reflect(self, ctx):
        r = PassReflection()
        for c in ["color", "depth", "normals", "mvec"]:
            r.add_input(c, optional=True)
        return r.add_output("passthrough")

    def execute(self, ctx, inputs, state=None):
        x, y = int(self.cfg["x"]), int(self.cfg["y"])
        self.last = {k: v[y, x] for k, v in inputs.items()}
        first = next(iter(inputs.values())) if inputs else jnp.zeros((1, 1))
        return {"passthrough": first}, None


def pixel_debug_print(tag, image, at=(0, 0)):
    """PixelDebug-style print (Utils/Debug/PixelDebug.h:54-76): emits the
    value of `image` at pixel `at` from inside jit; returns image unchanged."""
    y, x = at
    jax.debug.print("PixelDebug[" + f"{x},{y}" + "] " + tag + ": {v}",
                    v=image[y, x])
    return image


def pixel_debug_assert(pred_image, message="assert failed"):
    """PixelDebug assert: report the count of failing pixels."""
    fails = jnp.sum(~pred_image)
    jax.debug.print("PixelDebug assert '" + message + "': {n} failing", n=fails)
    return fails
