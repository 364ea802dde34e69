"""TestPasses — framework test rigs (reference
Source/RenderPasses/TestPasses/: TestPyTorchPass exchanges GPU tensors with
PyTorch through CUDA interop buffers; TestRtProgram exercises RT program
permutations).

TPU-native re-design: the tensor bridge is DLpack between JAX and torch —
the same zero-copy contract the reference builds by hand with shared CUDA
buffers (TestPyTorchPass.cpp:88-186). generateData fills the index+offset
pattern in a jitted kernel and exports to torch; verifyData imports a torch
tensor and checks the pattern in a jitted comparison. TestRtProgram's
"many ray programs against one scene" becomes one batched intersection
query per named sub-test through the shared chunked kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


def _pattern(dim, offset):
    k = jnp.arange(dim[0], dtype=jnp.float32)[:, None, None]
    j = jnp.arange(dim[1], dtype=jnp.float32)[None, :, None]
    i = jnp.arange(dim[2], dtype=jnp.float32)[None, None, :]
    return (k * dim[1] + j) * dim[2] + i + jnp.float32(offset)


@register_pass("TestPyTorchPass")
class TestPyTorchPass(RenderPass):
    """data[k][j][i] = linear index + offset, exchanged with torch
    (TestPyTorchPass.cs.slang writeBuffer/verifyBuffer)."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection()

    def execute(self, ctx, inputs, state=None):
        return {}, None

    # --- the scripted API (FalcorPython binding surface) ----------------
    def generateData(self, dim, offset):
        import torch
        dim = tuple(int(d) for d in dim)
        arr = jax.jit(_pattern, static_argnums=0)(dim, float(offset))
        try:  # zero-copy when backends share a device space
            return torch.from_dlpack(arr)
        except Exception:
            import numpy as np
            return torch.from_numpy(np.asarray(arr))

    def verifyData(self, dim, offset, data):
        import torch
        dim = tuple(int(d) for d in dim)
        if not isinstance(data, torch.Tensor) \
                or data.dtype != torch.float32 \
                or tuple(data.shape) != dim:
            return False
        try:
            arr = jnp.from_dlpack(data.contiguous())
        except Exception:
            arr = jnp.asarray(data.detach().cpu().numpy())

        @jax.jit
        def check(a):
            return jnp.all(a == _pattern(dim, float(offset)))
        return bool(check(arr))


@register_pass("TestRtProgram")
class TestRtProgram(RenderPass):
    """RT-program smoke rig (reference TestRtProgram.rt.slang: a set of ray
    programs traced against the scene and written to an output grid). Here:
    one closest-hit wavefront per mode over a small probe grid."""

    SCHEMA = dict(mode=0, grid=16, chunk=128)

    def reflect(self, ctx):
        return PassReflection().add_output("output")

    def execute(self, ctx, inputs, state=None):
        from ..ops import rt
        scene = ctx.scene
        cam = scene.camera
        n = int(self.cfg["grid"])
        xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        u, v = jnp.meshgrid(xs, xs, indexing="xy")
        px = jnp.stack([u * ctx.width, v * ctx.height], -1)
        origin, dirs = cam.compute_ray_pinhole(px, (ctx.width, ctx.height))
        r = n * n
        t, tid = rt.closest_hit(scene, jnp.broadcast_to(origin, (r, 3)),
                                dirs.reshape(-1, 3), jnp.full((r,), 1e-3),
                                jnp.full((r,), cam.far_z),
                                chunk=int(self.cfg["chunk"]),
                                cull=(rt.CULL_BACK if self.cfg["mode"] == 0
                                      else rt.CULL_NONE))
        out = jnp.stack([t.reshape(n, n),
                         tid.reshape(n, n).astype(jnp.float32),
                         jnp.zeros((n, n))], -1)
        return {"output": out}, None
