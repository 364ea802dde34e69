"""AO baselines and AO post-processing.

VAO — single-pass screen-space volumetric AO baseline
  (reference Source/RenderPasses/VAO/VAO.ps.slang:37-120 — same sphere-slab
  math as SVAO phase 1, no stencil refinement).
RTAO — ground-truth ray-traced AO (reference Source/RenderPasses/RTAO/
  Ray.rt.slang:100-128: cosine-hemisphere ray, exponential falloff).
AOGuidedBlur — guided bilateral blur/upsample of bright/dark AO using
  mean/deviation statistics (reference AOGuidedBlur/AOGuidedBlur.ps.slang).
AOVarianceFix — bright/dark fusion by local deviation (reference
  Source/RenderPasses/AOVarianceFix/, same fusion math as the guided blur's
  deviation weighting).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import ao as A
from ..ops import rt
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import normalize, transform_vector
from .svao import DEPTH_MODE_DUAL, _normals_to_view, svao_phase1


@register_pass("VAO")
class VAO(RenderPass):
    SCHEMA = dict(radius=0.5, exponent=2.0, thickness=0.0, depthMode="SingleDepth",
                  sampleCount=8, kernel="VAO", guardBand=0)

    def reflect(self, ctx):
        return (PassReflection().add_input("depth")
                .add_input("depth2", optional=True)
                .add_input("normals").add_output("ambientMap"))

    def execute(self, ctx, inputs, state=None):
        from ..utils.sampling import AO_KERNEL_HBAO, AO_KERNEL_VAO
        cam = ctx.scene.camera
        depth = inputs["depth"]
        h, w = depth.shape
        cfg = A.VAOConfig(radius=float(self.cfg["radius"]),
                          exponent=float(self.cfg["exponent"]),
                          thickness=float(self.cfg["thickness"]),
                          num_directions=int(self.cfg["sampleCount"]),
                          kernel=AO_KERNEL_VAO if self.cfg["kernel"] == "VAO"
                          else AO_KERNEL_HBAO,
                          resolution=(w, h), low_resolution=(w, h))
        n_v = _normals_to_view(ctx, inputs["normals"])
        out = svao_phase1(cam, cfg, depth, inputs.get("depth2", depth), n_v,
                          ctx.guard_band,
                          primary=self.cfg["depthMode"], secondary="SingleDepth")
        return {"ambientMap": A.finalize(cfg, out["ao_raw"])}, None


def _cosine_dirs(n, seed=11):
    rng = np.random.default_rng(seed)
    u1 = rng.uniform(size=n).astype(np.float32)
    u2 = rng.uniform(size=n).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2.0 * np.pi * u2
    return np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(1.0 - u1)], -1)


def _jenkins(x):
    # uint32 arithmetic wraps mod 2^32 — no explicit masks (a 0xFFFFFFFF
    # literal weak-types to int32 and overflows at trace time on TPU)
    x = x.astype(jnp.uint32)
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


@register_pass("RTAO")
class RTAO(RenderPass):
    SCHEMA = dict(maxAORayTHit=0.5, maxTheoreticalTHit=0.5,
                  applyExponentialFalloff=True,
                  exponentialFalloffDecayConstant=2.0,
                  minimumAmbientIllumination=0.07, normalScale=0.01,
                  numSamples=1, sampleTableSize=256, chunk=256)

    def reflect(self, ctx):
        return (PassReflection().add_input("wPos").add_input("faceNormal")
                .add_output("ambient").add_output("rayDistance"))

    def execute(self, ctx, inputs, state=None):
        pos = inputs["wPos"]
        valid = pos[..., 3] > 0.0
        p = pos[..., :3]
        n = inputs["faceNormal"][..., :3]
        h, w = valid.shape

        # tangent frame (Ray.rt.slang getTangentVector)
        helper = jnp.where((jnp.abs(n[..., 0:1]) > 0.9), jnp.array([0.0, 1.0, 0.0]),
                           jnp.array([1.0, 0.0, 0.0]))
        bitan = normalize(jnp.cross(n, helper))
        tan = jnp.cross(bitan, n)

        table = jnp.asarray(_cosine_dirs(int(self.cfg["sampleTableSize"])))
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.uint32),
                              jnp.arange(w, dtype=jnp.uint32), indexing="ij")
        fi = jnp.uint32(ctx.frame_index)
        idx = _jenkins(xx * 449 + yy * 2857 + _jenkins(jnp.full_like(xx, fi))) \
            % jnp.uint32(self.cfg["sampleTableSize"])
        rd = table[idx]
        dirs = normalize(tan * rd[..., 0:1] + bitan * rd[..., 1:2] + n * rd[..., 2:3])

        origins = (p + n * float(self.cfg["normalScale"])).reshape(-1, 3)
        tmax_v = float(self.cfg["maxAORayTHit"])
        t, tid = rt.closest_hit(ctx.scene, origins, dirs.reshape(-1, 3),
                                jnp.full((h * w,), 1e-3),
                                jnp.full((h * w,), tmax_v),
                                chunk=int(self.cfg["chunk"]))
        hit = (tid >= 0).reshape(h, w)
        t = t.reshape(h, w)

        amb = jnp.ones((h, w))
        occl = jnp.ones((h, w))
        if self.cfg["applyExponentialFalloff"]:
            tt = t / float(self.cfg["maxTheoreticalTHit"])
            lam = float(self.cfg["exponentialFalloffDecayConstant"])
            occl = jnp.exp(-lam * tt * tt)
        min_amb = float(self.cfg["minimumAmbientIllumination"])
        amb = jnp.where(hit, 1.0 - (1.0 - min_amb) * occl, 1.0)
        amb = jnp.where(valid, amb, 1.0)
        dist = jnp.where(hit, t, tmax_v)
        return {"ambient": amb, "rayDistance": dist}, None


def _gauss(offset, variance):
    return jnp.exp(-0.5 * offset * offset / variance)


@register_pass("AOGuidedBlur")
class AOGuidedBlur(RenderPass):
    """Separable guided blur + bright/dark fusion (AOGuidedBlur.ps.slang).
    Input 'in' may be lower-res than 'depth' — the uv-space sampling makes
    this the guided *upsample* used by the quarter-res pipeline."""

    SCHEMA = dict(kernelRadius=4, localDeviation=True, enabled=True,
                  clampResults=True)

    DEPTH_VARIANCE = 0.001
    SPATIAL_VARIANCE = 16.4
    DARK_EPSILON = 0.01
    ENHANCE_CONTRAST = 1.0

    def reflect(self, ctx):
        # channel aliases: the reference names are ao2/lineardepth -> color
        # (AOGuidedBlur.cpp:37-40); the repo's graphs use in/depth -> out
        return (PassReflection().add_input("in", optional=True)
                .add_input("depth", optional=True)
                .add_input("ao2", optional=True)
                .add_input("lineardepth", optional=True)
                .add_output("out").add_output("color"))

    def execute(self, ctx, inputs, state=None):
        src = inputs.get("in", inputs.get("ao2"))
        depth_full = inputs.get("depth", inputs.get("lineardepth"))
        if src is None or depth_full is None:
            raise KeyError("AOGuidedBlur needs in/ao2 and depth/lineardepth")
        # reference-graph form: 4x4-deinterleaved texture arrays
        # ([16,qh,qw,...], DeinterleaveTexture outputs). Re-interleave,
        # blur at full res (same estimator, full spatial support), and
        # hand back both layouts.
        deint = src.ndim >= 3 and src.shape[0] == 16
        if deint:
            from .interleave import deinterleave_4x4, interleave_4x4
            fh, fw = src.shape[1] * 4, src.shape[2] * 4
            src = interleave_4x4(src, fh, fw)
            if depth_full.ndim >= 3 and depth_full.shape[0] == 16:
                depth_full = interleave_4x4(depth_full, fh, fw)
        if depth_full.ndim == 3 and depth_full.shape[-1] == 1:
            depth_full = depth_full[..., 0]
        if src.ndim == 2:
            src = jnp.stack([src, src], -1)
        if not self.cfg["enabled"]:
            # reference blits input to output when disabled
            # (AOGuidedBlur.cpp:130-139); fusion of bright/dark still
            # applies downstream semantics via the plain mean
            out = src[..., :2].mean(-1)
            if deint:
                from .interleave import deinterleave_4x4
                out = deinterleave_4x4(out)
            return {"out": out, "color": out}, None
        hf, wf = depth_full.shape
        hs, ws = src.shape[:2]
        r = int(self.cfg["kernelRadius"])

        # upsample AO to depth res by nearest (aligned repeat when integer
        # ratio — gather-free; gather fallback otherwise)
        if (hs, ws) != (hf, wf):
            if hf % hs == 0 and wf % ws == 0:
                src = jnp.repeat(jnp.repeat(src, hf // hs, axis=0),
                                 wf // ws, axis=1)
            else:
                ys = jnp.clip((jnp.arange(hf) * hs) // hf, 0, hs - 1)
                xs = jnp.clip((jnp.arange(wf) * ws) // wf, 0, ws - 1)
                src = src[ys][:, xs]
        original = src

        g = ctx.guard_band
        lo_x, hi_x = g, wf - g - 1
        lo_y, hi_y = g, hf - g - 1

        def pass1d(ao, ao_sq, axis, lo, hi):
            means = jnp.zeros_like(ao)
            means_sq = jnp.zeros_like(ao)
            wsum = jnp.zeros(ao.shape[:2])
            local_d = jnp.maximum(depth_full, 1.4e-45)
            from ..ops.ao import shift_axis_clamped
            for it in range(-r, r + 1):
                s_ao = shift_axis_clamped(ao, axis, it, lo, hi)
                s_sq = shift_axis_clamped(ao_sq, axis, it, lo, hi)
                s_d = shift_axis_clamped(depth_full, axis, it, lo, hi)
                spatial = _gauss(jnp.float32(it), self.SPATIAL_VARIANCE)
                rel = jnp.minimum(jnp.abs(s_d / local_d - 1.0), 1.0)
                w = spatial * _gauss(rel, self.DEPTH_VARIANCE)
                wsum = wsum + w
                means = means + w[..., None] * s_ao
                means_sq = means_sq + w[..., None] * s_sq
            ok = wsum > 1e-4
            means = jnp.where(ok[..., None], means / jnp.maximum(wsum, 1e-4)[..., None], ao)
            means_sq = jnp.where(ok[..., None], means_sq / jnp.maximum(wsum, 1e-4)[..., None], ao_sq)
            return means, means_sq

        m, msq = pass1d(src[..., :2], src[..., :2] ** 2, 1, lo_x, hi_x)
        m, msq = pass1d(m, msq, 0, lo_y, hi_y)

        c_orig = original[..., :2]
        if self.cfg["localDeviation"]:
            dev = jnp.abs(c_orig - m)
        else:
            dev = jnp.sqrt(jnp.maximum(msq - m * m, 0.0))
        dev = dev.at[..., 1].set(jnp.maximum(dev[..., 1], self.DARK_EPSILON))
        dev = dev.at[..., 0].set(dev[..., 0] * self.ENHANCE_CONTRAST)
        wgt = dev[..., ::-1] / jnp.maximum(dev[..., 0] + dev[..., 1], 1e-8)[..., None]
        c = jnp.sum(c_orig * wgt, -1)
        # clampResults is accepted for reference-script parity; the
        # reference shader's clamp is commented out upstream
        # (AOGuidedBlur.ps.slang:155,201), so it is a documented no-op
        if deint:
            from .interleave import deinterleave_4x4
            c = deinterleave_4x4(c)
        return {"out": c, "color": c}, None


@register_pass("AOVarianceFix")
class AOVarianceFix(RenderPass):
    """Fuse bright/dark AO channels by local variance (reference
    Source/RenderPasses/AOVarianceFix/ — deviation weighting as in
    AOGuidedBlur's fusion stage, over a small local window)."""

    SCHEMA = dict(kernelRadius=2)

    def reflect(self, ctx):
        # repo form: stacked bright/dark on 'in'; reference form: separate
        # bright/dark/lineardepth planes (AOVarianceFix.cpp:35-40), possibly
        # 4x4-deinterleaved; output rides both 'out' and 'color'
        return (PassReflection().add_input("in", optional=True)
                .add_input("bright", optional=True)
                .add_input("dark", optional=True)
                .add_input("lineardepth", optional=True)
                .add_output("out").add_output("color"))

    def execute(self, ctx, inputs, state=None):
        deint = False
        if "in" in inputs:
            src = inputs["in"]
        else:
            b, dk = inputs["bright"], inputs["dark"]
            if b.ndim >= 3 and b.shape[0] == 16:
                from .interleave import interleave_4x4
                fh, fw = b.shape[1] * 4, b.shape[2] * 4
                b = interleave_4x4(b, fh, fw)
                dk = interleave_4x4(dk, fh, fw)
                deint = True
            if b.ndim == 3 and b.shape[-1] == 1:
                b, dk = b[..., 0], dk[..., 0]
            src = jnp.stack([b, dk], -1)
        if src.ndim == 2:
            return {"out": src, "color": src}, None
        r = int(self.cfg["kernelRadius"])
        h, w = src.shape[:2]
        acc = jnp.zeros_like(src[..., :2])
        acc_sq = jnp.zeros_like(acc)
        cnt = 0
        from ..ops.ao import shift2d_clamped
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                s = shift2d_clamped(src[..., :2], dy, dx)
                acc = acc + s
                acc_sq = acc_sq + s * s
                cnt += 1
        mean = acc / cnt
        dev = jnp.sqrt(jnp.maximum(acc_sq / cnt - mean * mean, 0.0))
        dev = dev.at[..., 1].set(jnp.maximum(dev[..., 1], 0.01))
        wgt = dev[..., ::-1] / jnp.maximum(dev[..., 0] + dev[..., 1], 1e-8)[..., None]
        out = jnp.sum(src[..., :2] * wgt, -1)
        if deint:
            from .interleave import deinterleave_4x4
            out = deinterleave_4x4(out)
        return {"out": out, "color": out}, None
