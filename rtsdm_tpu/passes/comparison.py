"""Comparison/debug passes: SplitScreenPass, SideBySidePass, ColorMapPass.

References:
  Source/RenderPasses/DebugPasses/ComparisonPass.h:36 (shared left/right
    comparison contract: splitLoc fraction, divider of 2*dividerSize+1 px,
    optional side swap)
  Source/RenderPasses/DebugPasses/SplitScreenPass/ — one image, divided at
    splitLoc, left input left of the divider
  Source/RenderPasses/DebugPasses/SideBySidePass/ — both images side by
    side, each showing its splitLoc-scrolled window
  Source/RenderPasses/DebugPasses/ColorMapPass/ColorMapPass.ps.slang — scalar
    channel -> [minValue,maxValue]-normalized color map (Grey/Jet/Viridis/
    Plasma/Magma/Inferno)

TPU design: pure elementwise `where` composites — no gathers; the color maps
are evaluated as polynomial fits (Viridis-family) / piecewise ramps (Jet)
instead of texture LUT fetches, keeping the pass fusable into its consumer.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


def _rgb(img):
    """Accept [H,W], [H,W,1], [H,W,3], [H,W,4] -> [H,W,3]."""
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        return jnp.broadcast_to(img, img.shape[:-1] + (3,))
    return img[..., :3]


class _ComparisonPass(RenderPass):
    """Shared left/right machinery (ComparisonPass.h:36)."""

    SCHEMA = dict(splitLocation=0.5, dividerSize=2, swapSides=False,
                  showTextLabels=False, leftLabel="Left side",
                  rightLabel="Right side")

    def reflect(self, ctx):
        return (PassReflection().add_input("leftInput")
                .add_input("rightInput").add_output("output"))

    def _sides(self, inputs):
        left = _rgb(inputs["leftInput"])
        right = _rgb(inputs["rightInput"])
        if bool(self.cfg["swapSides"]):
            left, right = right, left
        return left, right


@register_pass("SplitScreenPass")
class SplitScreenPass(_ComparisonPass):
    """Left image left of the divider, right image right of it; a divider
    bar of 2*dividerSize+1 pixels (Comparison.ps.slang divider overlay)."""

    def execute(self, ctx, inputs, state=None):
        left, right = self._sides(inputs)
        h, w = left.shape[:2]
        split_px = float(self.cfg["splitLocation"]) * w
        div = int(self.cfg["dividerSize"])
        x = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        out = jnp.where(x < split_px, left, right)
        # divider color: the reference uses a highlight bar
        on_div = jnp.abs(x - split_px) < (div + 0.5)
        out = jnp.where(on_div, jnp.asarray([0.85, 0.24, 0.23]), out)
        return {"output": out}, None


@register_pass("SideBySidePass")
class SideBySidePass(_ComparisonPass):
    """Each half shows its own image's window starting at splitLoc
    (SideBySidePass semantics: compare the same region of both images)."""

    def execute(self, ctx, inputs, state=None):
        left, right = self._sides(inputs)
        h, w = left.shape[:2]
        half = w // 2
        # window offset: splitLocation scrolls which region both halves show
        off = int(round(float(self.cfg["splitLocation"]) * max(w - half, 1)))
        off = max(0, min(off, w - half))
        lw = left[:, off:off + half]
        rw = right[:, off:off + half]
        out = jnp.concatenate([lw, rw], axis=1)
        if out.shape[1] < w:  # odd width: pad the seam column
            out = jnp.pad(out, ((0, 0), (0, w - out.shape[1]), (0, 0)))
        return {"output": out}, None


# --- ColorMapPass -----------------------------------------------------------

def _viridis_family(t, c0, c1, c2, c3, c4, c5, c6):
    """Degree-6 polynomial fit of the matplotlib colormaps (public-domain
    fit coefficients style; evaluated in fp32, no LUT gather)."""
    t = t[..., None]
    return (c0 + t * (c1 + t * (c2 + t * (c3 + t * (c4 + t * (c5 + t * c6))))))


_POLY = {
    "Viridis": ([0.2777, 0.0054, 0.3340], [0.1050, 1.4046, 1.3845],
                [-0.3308, 0.2148, 0.0950], [-4.6342, -5.7991, -19.3324],
                [6.2282, 14.1799, 56.6905], [4.7763, -13.7451, -65.3530],
                [-5.4354, 4.6456, 26.3124]),
    "Plasma": ([0.0587, 0.0234, 0.5433], [2.1765, 0.2383, 0.7539],
               [-2.6894, -7.4558, 3.1107], [6.1303, 42.3461, -28.5188],
               [-11.1074, -82.6663, 60.1398], [10.0230, 71.4136, -54.0721],
               [-3.6587, -22.9315, 18.1919]),
    "Magma": ([-0.0023, -0.0007, -0.0053], [0.2513, 0.6775, 2.4940],
              [8.3537, -3.5777, 0.3144], [-27.6687, 14.2647, -13.6492],
              [52.1761, -27.9436, 12.9441], [-50.7685, 29.0465, 4.2341],
              [18.6557, -11.4897, -5.6019]),
    "Inferno": ([0.0002, 0.0016, -0.0194], [0.1065, 0.5639, 3.9327],
                [11.6024, -3.9728, -15.9423], [-41.7039, 17.4363, 44.3541],
                [77.1629, -33.4023, -81.8073], [-71.3194, 32.6260, 73.2095],
                [25.1311, -12.2426, -23.0703]),
}


def apply_color_map(t, name: str):
    """t in [0,1] (any shape) -> rgb [..,3]."""
    t = jnp.clip(t, 0.0, 1.0)
    if name == "Grey":
        return jnp.stack([t, t, t], -1)
    if name == "Jet":
        r = jnp.clip(1.5 - jnp.abs(4.0 * t - 3.0), 0, 1)
        g = jnp.clip(1.5 - jnp.abs(4.0 * t - 2.0), 0, 1)
        b = jnp.clip(1.5 - jnp.abs(4.0 * t - 1.0), 0, 1)
        return jnp.stack([r, g, b], -1)
    coeffs = _POLY[name]
    return jnp.clip(_viridis_family(t, *(jnp.asarray(c) for c in coeffs)), 0, 1)


@register_pass("ColorMapPass")
class ColorMapPass(RenderPass):
    """Scalar channel -> colorized output (ColorMapPass.ps.slang: value from
    _CHANNEL, normalized by [minValue,maxValue], mapped by ColorMap enum)."""

    SCHEMA = dict(colorMap="Jet", channel=0, autoRange=True,
                  minValue=0.0, maxValue=1.0)

    def reflect(self, ctx):
        return PassReflection().add_input("input").add_output("output")

    def execute(self, ctx, inputs, state=None):
        img = inputs["input"]
        ch = int(self.cfg["channel"])
        v = img if img.ndim == 2 else img[..., min(ch, img.shape[-1] - 1)]
        v = v.astype(jnp.float32)
        if bool(self.cfg["autoRange"]):
            lo, hi = jnp.min(v), jnp.max(v)
        else:
            lo = jnp.float32(self.cfg["minValue"])
            hi = jnp.float32(self.cfg["maxValue"])
        t = jnp.where(hi == lo, 0.0, (v - lo) / jnp.where(hi == lo, 1.0, hi - lo))
        return {"output": apply_color_map(t, str(self.cfg["colorMap"]))}, None
