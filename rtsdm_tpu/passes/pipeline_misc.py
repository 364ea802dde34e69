"""Misc pipeline + debug passes.

References (Source/RenderPasses/...):
  ZMipmaps/ZMipmaps.cpp:77-78       — min/max depth mip pyramid
  VarianceMap/*                     — (x, x^2) variance mips of depth/normals
  RayMinMaxLength/*.ps.slang        — debug view of ray interval textures
  DebugStochasticDepth/*            — visualize SD samples as points
  Utils/GaussianBlur, Composite, CrossFade (Utils passes, 1,636 LoC)
  ImageLoader / BlitPass
  DepthPeelSinglePass/DepthPeelSinglePass.cpp:101-104
  TemporalDepthPeel/TemporalDepthPeel.cpp:140-144
  DebugPasses/InvalidPixelDetectionPass — NaN/Inf visualizer
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.raster import rasterize
from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


def _min_pool2(a, op):
    h, w = a.shape
    a = a[:h - h % 2, :w - w % 2]
    r = a.reshape(h // 2, 2, w // 2, 2)
    return op(op(r[:, 0, :, 0], r[:, 0, :, 1]), op(r[:, 1, :, 0], r[:, 1, :, 1]))


@register_pass("ZMipmaps")
class ZMipmaps(RenderPass):
    """Linear-depth mip pyramid with the reference's thresholded
    perspective-correct downsample (Mip.ps.slang:13-38: per quad, take the
    max non-far depth as ref, keep texels with d > threshold*ref, output the
    harmonic mean 1/avg(1/d); farZ when the whole quad is far). threshold
    adapts per level when adaptiveThreshold (ZMipmaps.cpp:105-107).

    Channels use the reference names (linearZ -> linearZMip: the level-0
    copy, reference scripts feed it straight into SVAO.depth; the chain
    itself rides the 'mips' channel as a tuple)."""

    SCHEMA = dict(mipLevels=-1, threshold=0.9, adaptiveThreshold=True)

    def reflect(self, ctx):
        return (PassReflection().add_input("linearZ")
                .add_output("linearZMip").add_output("mips"))

    def execute(self, ctx, inputs, state=None):
        d = inputs["linearZ"]
        far_z = jnp.float32(ctx.scene.camera.far_z)
        t0 = float(self.cfg["threshold"])
        n = int(self.cfg["mipLevels"])
        if n < 0:
            n = max(1, int(np.floor(np.log2(min(d.shape)))))
        mips = []
        cur = d
        for i in range(n):
            h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
            if h2 < 1 or w2 < 1:
                break
            t = t0
            if self.cfg["adaptiveThreshold"]:
                t = t0 / (t0 + 2.0 ** i * (1.0 - t0))
            e = cur[:h2 * 2, :w2 * 2]
            quad = jnp.stack([e[0::2, 0::2], e[0::2, 1::2],
                              e[1::2, 0::2], e[1::2, 1::2]])     # [4,h2,w2]
            valid = quad < far_z
            ref = jnp.max(jnp.where(valid, quad, 1e-10), axis=0)
            w = (valid & (quad > t * ref)).astype(jnp.float32)
            wsum = jnp.sum(w, axis=0)
            inv = jnp.sum(w / jnp.maximum(quad, 1e-10), axis=0)
            cur = jnp.where(wsum > 0.0, wsum / jnp.maximum(inv, 1e-20),
                            far_z)
            mips.append(cur)
        return {"linearZMip": d, "mips": tuple(mips)}, None


@register_pass("VarianceMap")
class VarianceMap(RenderPass):
    """(x, x^2) mip pyramid of depth or normals (VarianceMap/Mip.ps.slang)."""

    SCHEMA = dict(levels=5, mode="depth")

    def reflect(self, ctx):
        return PassReflection().add_input("input").add_output("variance")

    def execute(self, ctx, inputs, state=None):
        x = inputs["input"]
        if x.ndim == 3:
            x = jnp.linalg.norm(x, axis=-1)
        m1, m2 = x, x * x
        avg = lambda a: _min_pool2(a, lambda p, q: (p + q)) * 0.25
        for _ in range(int(self.cfg["levels"])):
            m1 = avg(m1)
            m2 = avg(m2)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        return {"variance": jnp.stack([m1, var], -1)}, None


@register_pass("VarianceMapPreview")
class VarianceMapPreview(RenderPass):
    SCHEMA = dict(scale=10.0)

    def reflect(self, ctx):
        return PassReflection().add_input("variance").add_output("preview")

    def execute(self, ctx, inputs, state=None):
        v = inputs["variance"][..., 1]
        return {"preview": jnp.clip(v * float(self.cfg["scale"]), 0.0, 1.0)}, None


@register_pass("RayMinMaxLength")
class RayMinMaxLength(RenderPass):
    """Interval-length debug view (RayMinMaxLength.ps.slang): 0 where no
    request, else (rayMax - rayMin)/32."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return (PassReflection().add_input("kRayMin").add_input("kRayMax")
                .add_output("length"))

    def execute(self, ctx, inputs, state=None):
        rmin = inputs["kRayMin"]
        rmax = inputs["kRayMax"]
        valid = rmax != 0.0
        rmin = jnp.where(rmin >= 1e37, 0.0, rmin)
        return {"length": jnp.where(valid,
                                    jnp.maximum(rmax - rmin, 0.0) / 32.0, 0.0)}, None


@register_pass("DebugStochasticDepth")
class DebugStochasticDepth(RenderPass):
    """Visualizes SD-map samples as 3D points over the input image
    (DebugStochasticDepth.slang; the SD map is cached in the graph dictionary
    by SVAO, SVAO.cpp:394-404)."""

    SCHEMA = dict(pointSize=1, divisor=4)

    def reflect(self, ctx):
        return (PassReflection().add_input("depth").add_input("in")
                .add_output("out"))

    def execute(self, ctx, inputs, state=None):
        img = inputs["in"]
        sd = ctx.dictionary.get("SD_MAP")
        if sd is None:
            return {"out": img}, None
        cam = ctx.scene.camera
        h, w = img.shape[:2]
        div = int(self.cfg["divisor"])
        # mark pixels whose SD texel holds any sample nearer than the depth
        sd_core = sd
        g = (sd.shape[0] - (-(-h // div))) // 2
        if g > 0:
            sd_core = sd[g:g + -(-h // div), g:g + -(-w // div)]
        has = jnp.any(sd_core < 0.999, axis=-1)
        has_full = jnp.repeat(jnp.repeat(has, div, 0), div, 1)[:h, :w]
        mark = jnp.asarray([1.0, 0.2, 0.2])
        out = jnp.where(has_full[..., None], 0.5 * img[..., :3] + 0.5 * mark,
                        img[..., :3])
        return {"out": out}, None


@register_pass("GaussianBlur")
class GaussianBlur(RenderPass):
    """Separable Gaussian (Utils/GaussianBlur.ps.slang)."""

    SCHEMA = dict(kernelWidth=5, sigma=1.0)

    def reflect(self, ctx):
        return PassReflection().add_input("src").add_output("dst")

    def execute(self, ctx, inputs, state=None):
        from ..ops.ao import shift_axis_clamped
        x = inputs["src"]
        r = int(self.cfg["kernelWidth"]) // 2
        sigma = float(self.cfg["sigma"])
        w = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
        w = (w / w.sum()).astype(np.float32)
        for axis in (0, 1):
            acc = jnp.zeros_like(x)
            for i, wi in enumerate(w):
                acc = acc + float(wi) * shift_axis_clamped(x, axis, i - r)
            x = acc
        return {"dst": x}, None


@register_pass("Composite")
class Composite(RenderPass):
    """A*B / A+B compositing (Utils/Composite)."""

    SCHEMA = dict(mode="Multiply", scaleA=1.0, scaleB=1.0, outputFormat="RGBA32Float")

    def reflect(self, ctx):
        return (PassReflection().add_input("A").add_input("B")
                .add_output("out"))

    def execute(self, ctx, inputs, state=None):
        a = inputs["A"] * float(self.cfg["scaleA"])
        b = inputs["B"] * float(self.cfg["scaleB"])
        if a.ndim == 2:
            a = a[..., None]
        if b.ndim == 2:
            b = b[..., None]
        c = min(a.shape[-1], b.shape[-1])
        out = a[..., :c] * b[..., :c] if self.cfg["mode"] == "Multiply" \
            else a[..., :c] + b[..., :c]
        return {"out": out}, None


@register_pass("CrossFade")
class CrossFade(RenderPass):
    SCHEMA = dict(factor=0.5)

    def reflect(self, ctx):
        return (PassReflection().add_input("A").add_input("B")
                .add_output("out"))

    def execute(self, ctx, inputs, state=None):
        f = jnp.float32(self.cfg["factor"])
        return {"out": inputs["A"] * (1 - f) + inputs["B"] * f}, None


@register_pass("ImageLoader")
class ImageLoader(RenderPass):
    """Loads an image file as a channel (ImageLoader)."""

    SCHEMA = dict(filename="", mips=False, srgb=False, arrayIndex=0, mipLevel=0)

    def reflect(self, ctx):
        return PassReflection().add_output("dst")

    def execute(self, ctx, inputs, state=None):
        import numpy as _np
        fn = self.cfg["filename"]
        if not fn:
            return {"dst": jnp.zeros((ctx.height, ctx.width, 4))}, None
        from ..utils.image_io import load_image
        img = load_image(str(fn)).astype(_np.float32)
        if self.cfg["srgb"]:
            img = _np.power(_np.clip(img, 0.0, 1.0), 2.2)
        return {"dst": jnp.asarray(img)}, None


@register_pass("BlitPass")
class BlitPass(RenderPass):
    SCHEMA = dict(filter="Linear")

    def reflect(self, ctx):
        return PassReflection().add_input("src").add_output("dst")

    def execute(self, ctx, inputs, state=None):
        return {"dst": inputs["src"]}, None


@register_pass("InvalidPixelDetectionPass")
class InvalidPixelDetection(RenderPass):
    """NaN/Inf visualizer (DebugPasses): red = NaN, yellow = Inf."""

    SCHEMA = dict()

    def reflect(self, ctx):
        return PassReflection().add_input("src").add_output("dst")

    def execute(self, ctx, inputs, state=None):
        x = inputs["src"]
        if x.ndim == 2:
            x = x[..., None]
        nan = jnp.any(jnp.isnan(x), -1)
        inf = jnp.any(jnp.isinf(x), -1)
        base = jnp.clip(x[..., :3] if x.shape[-1] >= 3 else
                        jnp.repeat(x[..., :1], 3, -1), 0, 1)
        out = jnp.where(nan[..., None], jnp.asarray([1.0, 0.0, 0.0]), base)
        out = jnp.where(inf[..., None], jnp.asarray([1.0, 1.0, 0.0]), out)
        return {"dst": out}, None


@register_pass("DownsamplePass")
class DownsamplePass(RenderPass):
    """Aligned block downsample (point/min/mean) — feeds the quarter-res AO
    path of BASELINE config 4. Depth should use 'point' or 'min' (never mean
    across depth edges)."""

    SCHEMA = dict(factor=4, mode="point")

    def reflect(self, ctx):
        return PassReflection().add_input("input").add_output("output")

    def execute(self, ctx, inputs, state=None):
        x = inputs["input"]
        f = int(self.cfg["factor"])
        h, w = x.shape[:2]
        hp, wp = h - h % f, w - w % f
        x = x[:hp, :wp]
        if self.cfg["mode"] == "point":
            out = x[f // 2::f, f // 2::f]
        else:
            r = x.reshape((hp // f, f, wp // f, f) + x.shape[2:])
            out = r.min((1, 3)) if self.cfg["mode"] == "min" else r.mean((1, 3))
        return {"output": out}, None


@register_pass("DepthPeelSinglePass")
class DepthPeelSinglePass(RenderPass):
    """Approximate 2-layer peel in one raster (DepthPeelSinglePass.cpp:
    101-104): second-nearest depth via a k=2 stochastic raster with full
    coverage."""

    SCHEMA = dict(cullMode="Back", minSeparationDistance=0.01, maxPerTile=256)

    def reflect(self, ctx):
        return PassReflection().add_input("linearZ").add_output("depth2")

    def execute(self, ctx, inputs, state=None):
        from .stochastic_depth import _raster_stochastic
        cam = ctx.scene.camera
        depths = _raster_stochastic(
            ctx.scene, ctx.width, ctx.height, 2, 1.0,
            first_depth=inputs["linearZ"],
            cull=self.cfg["cullMode"].lower(),
            max_per_tile=int(self.cfg["maxPerTile"]))
        lin2 = depths[..., 0]
        # back to non-linear depth for LinearizeDepth parity
        nl = cam.far_z * (lin2 - cam.near_z) / (lin2 * (cam.far_z - cam.near_z))
        return {"depth2": jnp.clip(nl, 0.0, 1.0)}, None


@register_pass("TemporalDepthPeel")
class TemporalDepthPeel(RenderPass):
    """Second depth layer from the reprojected previous frame
    (TemporalDepthPeel.cpp:140-144)."""

    SCHEMA = dict(minSeparationDistance=0.5)

    def reflect(self, ctx):
        return (PassReflection().add_input("linearZ").add_input("mvec")
                .add_output("depth2"))

    def init_state(self, ctx):
        return {"prev": jnp.full((ctx.height, ctx.width), 1e30),
                "valid": jnp.zeros((), bool)}

    def execute(self, ctx, inputs, state=None):
        from .temporal import _bilinear, _grid_uv
        cam = ctx.scene.camera
        z = inputs["linearZ"]
        h, w = z.shape
        mvec = inputs["mvec"][..., :2]
        uv = _grid_uv(h, w) + mvec
        prev = _bilinear(state["prev"][..., None], uv)[..., 0]
        # previous depth only counts as a second layer if behind the first
        # by at least minSeparationDistance (TemporalDepthPeel.cpp:53,140)
        sep = float(self.cfg["minSeparationDistance"])
        d2 = jnp.where(state["valid"] & (prev > z + sep), prev, cam.far_z)
        nl = cam.far_z * (d2 - cam.near_z) / (jnp.maximum(d2, 1e-6)
                                              * (cam.far_z - cam.near_z))
        return ({"depth2": jnp.clip(nl, 0.0, 1.0)},
                {"prev": z, "valid": jnp.ones((), bool)})
