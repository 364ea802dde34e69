"""Temporal passes: TAA, TemporalAO, AOFlickerMask, BinaryDilation,
AccumulatePass.

References:
  TAA/TAA.ps.slang (YCgCo variance clipping + Catmull-Rom history)
  TemporalAO/TemporalAO.ps.slang (mvec reprojection + relative-depth reject)
  AOFlickerMask/AOFlickerMask.ps.slang (plane-difference stability mask)
  BinaryDilation/BinaryDilation.ps.slang (gathered min/max dilation)
  AccumulatePass/AccumulatePass.h:44 (running average for ground truth)

Temporal state (the reference's persistent textures) lives in the pass-state
pytree threaded by the graph executor.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils.math import rgb_to_ycgco, saturate, transform_point, ycgco_to_rgb


def _grid_uv(h, w):
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)


def _shift(a, dy, dx):
    """Edge-clamped neighbor fetch for [H,W,...] arrays (gather-free)."""
    from ..ops.ao import shift2d_clamped
    return shift2d_clamped(a, dy, dx)


def _use_warp_kernel():
    import jax
    return jax.devices()[0].platform not in ("cpu",)


def _bilinear(tex, uv):
    """[H,W,C] linear sample at uv."""
    h, w = tex.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    a = tex[y0c, x0c] * (1 - fx) + tex[y0c, x1c] * fx
    b = tex[y1c, x0c] * (1 - fx) + tex[y1c, x1c] * fx
    return a * (1 - fy) + b * fy


def _catmull_rom(tex, sample_pos):
    """9-tap Catmull-Rom resample (TAA.ps.slang:45-76)."""
    h, w = tex.shape[:2]
    tc = jnp.floor(sample_pos - 0.5) + 0.5
    f = sample_pos - tc
    f2, f3 = f * f, f * f * f
    w0 = f2 - 0.5 * (f3 + f)
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w3 = 0.5 * (f3 - f2)
    w2 = 1.0 - w0 - w1 - w3
    w12 = w1 + w2
    tc0 = tc - 1.0
    tc12 = tc + w2 / jnp.where(w12 == 0.0, 1.0, w12)
    tc3 = tc + 2.0

    def s(px, py, wx, wy):
        uv = jnp.stack([px / w, py / h], -1)
        return _bilinear(tex, uv) * (wx * wy)[..., None]

    out = (s(tc0[..., 0], tc0[..., 1], w0[..., 0], w0[..., 1])
           + s(tc0[..., 0], tc12[..., 1], w0[..., 0], w12[..., 1])
           + s(tc0[..., 0], tc3[..., 1], w0[..., 0], w3[..., 1])
           + s(tc12[..., 0], tc0[..., 1], w12[..., 0], w0[..., 1])
           + s(tc12[..., 0], tc12[..., 1], w12[..., 0], w12[..., 1])
           + s(tc12[..., 0], tc3[..., 1], w12[..., 0], w3[..., 1])
           + s(tc3[..., 0], tc0[..., 1], w3[..., 0], w0[..., 1])
           + s(tc3[..., 0], tc12[..., 1], w3[..., 0], w12[..., 1])
           + s(tc3[..., 0], tc3[..., 1], w3[..., 0], w3[..., 1]))
    return out


@register_pass("TAA")
class TAA(RenderPass):
    SCHEMA = dict(alpha=0.1, colorBoxSigma=0.5, antiFlicker=True)

    def reflect(self, ctx):
        return (PassReflection().add_input("colorIn").add_input("motionVecs")
                .add_output("colorOut"))

    def init_state(self, ctx):
        return {"prev": jnp.zeros((ctx.height, ctx.width, 3), jnp.float32),
                "valid": jnp.zeros((), bool)}

    def execute(self, ctx, inputs, state=None):
        color = inputs["colorIn"][..., :3]
        mvec = inputs["motionVecs"][..., :2]
        h, w = color.shape[:2]
        prev = jnp.where(state["valid"], state["prev"], color)

        c = rgb_to_ycgco(color)
        avg = c
        var = c * c
        # 3x3 neighborhood color box + longest motion vector (ps.slang:81-127)
        motion = mvec
        m_len = jnp.sum(mvec * mvec, -1)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                cn = rgb_to_ycgco(_shift(color, dy, dx))
                avg = avg + cn
                var = var + cn * cn
                mn = _shift(mvec, dy, dx)
                ln = jnp.sum(mn * mn, -1)
                take = ln > m_len
                motion = jnp.where(take[..., None], mn, motion)
                m_len = jnp.maximum(m_len, ln)
        avg = avg / 9.0
        var = var / 9.0
        sigma = jnp.sqrt(jnp.maximum(var - avg * avg, 0.0))
        box = float(self.cfg["colorBoxSigma"])
        cmin = avg - box * sigma
        cmax = avg + box * sigma

        uv = _grid_uv(h, w)
        sample_pos = (uv + motion) * jnp.asarray([w, h], jnp.float32)
        if _use_warp_kernel():
            # TPU: the 9-tap CR fetch is ~100M gathered elements at 720p
            # (~1 s) as XLA; the warp kernel does it gather-free
            # (ops/warp_pallas.py). Fallback plane = current color: the
            # variance clip bounds it exactly like a disocclusion.
            from ..ops.warp_pallas import warp_resample_pallas
            hist_rgb = warp_resample_pallas(
                jnp.moveaxis(prev, -1, 0), sample_pos[..., 0],
                sample_pos[..., 1], jnp.moveaxis(color, -1, 0),
                mode="catmull_rom")
            hist = rgb_to_ycgco(jnp.moveaxis(hist_rgb, 0, -1))
        else:
            hist = rgb_to_ycgco(_catmull_rom(prev, sample_pos))

        alpha = jnp.float32(self.cfg["alpha"])
        if self.cfg["antiFlicker"]:
            # Karis anti-flicker (ps.slang:136-143)
            dist = jnp.minimum(jnp.abs(cmin[..., 0] - hist[..., 0]),
                               jnp.abs(cmax[..., 0] - hist[..., 0]))
            denom = dist + cmax[..., 0] - cmin[..., 0]
            alpha = jnp.clip((alpha * dist) / jnp.maximum(denom, 1e-8),
                             0.0, 1.0)[..., None]
        hist = jnp.clip(hist, cmin, cmax)
        out = ycgco_to_rgb(hist + (c - hist) * alpha)
        return ({"colorOut": out},
                {"prev": out, "valid": jnp.ones((), bool)})


@register_pass("TemporalAO")
class TemporalAO(RenderPass):
    SCHEMA = dict(enabled=True, useStableMask=True)

    def reflect(self, ctx):
        return (PassReflection().add_input("aoIn").add_input("linearZ")
                .add_input("mvec").add_input("stableMask", optional=True)
                .add_output("aoOut"))

    def init_state(self, ctx):
        shape = (ctx.height, ctx.width)
        return {"prev_ao": jnp.ones(shape, jnp.float32),
                "prev_depth": jnp.zeros(shape, jnp.float32),
                "history": jnp.zeros(shape, jnp.uint32),
                "prev_view": ctx.scene.camera.view_mat if ctx.scene else jnp.eye(4),
                "valid": jnp.zeros((), bool)}

    def execute(self, ctx, inputs, state=None):
        ao = inputs["aoIn"]
        if ao.ndim == 3:
            ao = ao[..., 0]
        if not self.cfg["enabled"]:
            return {"aoOut": ao}, state
        cam = ctx.scene.camera
        depth = inputs["linearZ"]
        mvec = inputs["mvec"][..., :2]
        h, w = depth.shape
        g = ctx.guard_band
        uv = _grid_uv(h, w)
        prev_uv = uv + mvec

        uv_min = (g + 0.5) / jnp.asarray([w, h], jnp.float32)
        uv_max = 1.0 - uv_min
        in_area = jnp.all((prev_uv >= uv_min) & (prev_uv <= uv_max), -1)

        if _use_warp_kernel():
            from ..ops.warp_pallas import warp_resample_pallas
            spx = prev_uv[..., 0] * w
            spy = prev_uv[..., 1] * h
            near = warp_resample_pallas(
                jnp.stack([state["prev_depth"],
                           state["history"].astype(jnp.float32)]),
                spx, spy,
                jnp.stack([depth, jnp.zeros_like(depth)]), mode="nearest")
            prev_raw = near[0]
            prev_n_f = near[1]
        else:
            px = jnp.clip((prev_uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
            py = jnp.clip((prev_uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
            prev_raw = state["prev_depth"][py, px]
            prev_n_f = None
        # reproject previous view pos into the current view
        # (prevViewToCurView = viewMat * inverse(prevViewMat), ps.slang:84-86)
        prev_pos = cam.uv_to_view_space(prev_uv, prev_raw)
        m = cam.view_mat @ jnp.linalg.inv(state["prev_view"])
        cur_pos = transform_point(m, prev_pos)[..., :3]
        prev_depth = -cur_pos[..., 2]

        stable = inputs.get("stableMask")
        is_stable = (stable != 0) if (stable is not None and self.cfg["useStableMask"]) \
            else jnp.zeros_like(in_area)

        rel = jnp.abs(1.0 - prev_depth / jnp.maximum(depth, 1e-6))
        accept = state["valid"] & in_area & (rel < 0.1) & ~is_stable

        if _use_warp_kernel():
            from ..ops.warp_pallas import warp_resample_pallas
            prev_ao = warp_resample_pallas(
                state["prev_ao"][None], prev_uv[..., 0] * w,
                prev_uv[..., 1] * h, ao[None], mode="bilinear")[0]
            nf = prev_n_f
            prev_n = nf.astype(jnp.uint32)
        else:
            prev_ao = _bilinear(state["prev_ao"][..., None], prev_uv)[..., 0]
            prev_n = state["history"][py, px]
            nf = prev_n.astype(jnp.float32)
        merged = (nf * prev_ao + ao) / (nf + 1.0)
        out = jnp.where(accept, merged, ao)
        n_out = jnp.where(accept, jnp.minimum(prev_n + 1, 30), 1).astype(jnp.uint32)
        return ({"aoOut": out},
                {"prev_ao": out, "prev_depth": depth, "history": n_out,
                 "prev_view": cam.view_mat, "valid": jnp.ones((), bool)})


@register_pass("AOFlickerMask")
class AOFlickerMask(RenderPass):
    """Marks geometrically continuous (stable) pixels: 1 = continuous,
    0 = potential flicker (AOFlickerMask.ps.slang:44-82)."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return (PassReflection().add_input("linearZ").add_input("normalW")
                .add_output("mask"))

    def execute(self, ctx, inputs, state=None):
        from ..utils.math import normalize, transform_vector
        cam = ctx.scene.camera
        z = inputs["linearZ"]
        h, w = z.shape
        n_v = normalize(transform_vector(cam.view_mat, inputs["normalW"][..., :3]))
        uv = _grid_uv(h, w)
        p = cam.uv_to_view_space(uv, z)

        def plane_diff(dy, dx):
            zz = _shift(z, dy, dx)
            uu = jnp.stack([saturate((jnp.clip(jnp.arange(w) + dx, 0, w - 1)[None, :] + 0.5) / w
                                     * jnp.ones((h, 1))),
                            saturate((jnp.clip(jnp.arange(h) + dy, 0, h - 1)[:, None] + 0.5) / h
                                     * jnp.ones((1, w)))], -1)
            pp = cam.uv_to_view_space(uu, zz)
            d = pp - p
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
            return jnp.abs(jnp.sum(d * n_v, -1))

        dx = jnp.minimum(plane_diff(0, 1), plane_diff(0, -1))
        dy = jnp.minimum(plane_diff(1, 0), plane_diff(-1, 0))
        stable = (dx <= 0.1) & (dy <= 0.1)
        return {"mask": stable.astype(jnp.uint32)}, None


@register_pass("BinaryDilation")
class BinaryDilation(RenderPass):
    """min/max dilation over the gathered 5-point cross neighborhood
    (BinaryDilation.ps.slang:19-37)."""

    SCHEMA = dict(op="min")

    def reflect(self, ctx):
        return PassReflection().add_input("input").add_output("output")

    def execute(self, ctx, inputs, state=None):
        a = inputs["input"]
        op = jnp.minimum if self.cfg["op"] == "min" else jnp.maximum
        out = a
        # gather offsets approximate the ref's rotated 4x(2x2)-gather pattern
        for dy, dx in [(3, 1), (-1, 3), (-3, -1), (1, -3),
                       (1, 1), (1, -1), (-1, 1), (-1, -1),
                       (0, 1), (0, -1), (1, 0), (-1, 0)]:
            out = op(out, _shift(a, dy, dx))
        return {"output": out}, None


@register_pass("AccumulatePass")
class AccumulatePass(RenderPass):
    """Running average for converged references (AccumulatePass.h:44)."""

    SCHEMA = dict(enabled=True, outputSize="Default", autoReset=True,
                  precisionMode="Single", maxFrameCount=0, overflowMode="Stop")

    def reflect(self, ctx):
        return PassReflection().add_input("input").add_output("output")

    def init_state(self, ctx):
        return {"sum": jnp.zeros(()), "count": jnp.zeros((), jnp.int32),
                "initialized": jnp.zeros((), bool)}

    def execute(self, ctx, inputs, state=None):
        x = inputs["input"]
        if not self.cfg["enabled"]:
            return {"output": x}, state
        s = state["sum"]
        s = jnp.where(state["initialized"], s, jnp.zeros_like(x))
        s = s + x
        cnt = state["count"] + 1
        maxf = int(self.cfg["maxFrameCount"])
        if maxf > 0:
            cnt = jnp.minimum(cnt, maxf)
        out = s / cnt.astype(jnp.float32)
        return ({"output": out},
                {"sum": s, "count": cnt, "initialized": jnp.ones((), bool)})
