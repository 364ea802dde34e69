"""ImageEquation: runtime-parsed per-pixel formula pass
(reference Source/RenderPasses/ImageEquation/ImageEquation.cpp:73-77 — e.g.
'I0[xy].r * I1[xy]' composes AO x shading, used scripts/SVAO.py:14-15).

The formula is evaluated once at trace time over whole arrays (the per-pixel
loop becomes array broadcasting). D3D sampling rules apply: reading channels
beyond a texture's width yields g=b=0, a=1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass

_SWIZZLE = {"r": 0, "g": 1, "b": 2, "a": 3, "x": 0, "y": 1, "z": 2, "w": 3}


class _Img:
    """Wraps [H,W] or [H,W,C] as an rgba-swizzleable value."""

    def __init__(self, arr):
        if arr.ndim == 2:
            arr = arr[..., None]
        arr = arr.astype(jnp.float32)
        h, w, c = arr.shape
        chans = [arr[..., i] if i < c else
                 (jnp.ones((h, w), jnp.float32) if i == 3 else jnp.zeros((h, w), jnp.float32))
                 for i in range(4)]
        self._rgba = jnp.stack(chans, axis=-1)

    def __getitem__(self, _key):  # I0[xy]
        return self

    def __getattr__(self, name):
        if all(ch in _SWIZZLE for ch in name):
            # static channel slices + stack, NOT a fancy-index along the
            # minor axis (an [H,W,4] index-list gather costs gather rate
            # for H*W*len(name) elements on TPU)
            idx = [_SWIZZLE[ch] for ch in name]
            if len(idx) == 1:
                return self._rgba[..., idx[0]]
            import jax.numpy as jnp
            return jnp.stack([self._rgba[..., i] for i in idx], axis=-1)
        raise AttributeError(name)

    # arithmetic falls through to the full rgba array; a 2-D (single-channel)
    # operand broadcasts per channel, matching HLSL scalar*vector semantics
    def _pair(self, other):
        a = self._rgba
        b = other._rgba if isinstance(other, _Img) else jnp.asarray(other)
        if b.ndim == 2:
            b = b[..., None]
        return a, b

    def __mul__(self, o): a, b = self._pair(o); return a * b
    def __rmul__(self, o): a, b = self._pair(o); return b * a
    def __add__(self, o): a, b = self._pair(o); return a + b
    def __radd__(self, o): a, b = self._pair(o); return b + a
    def __sub__(self, o): a, b = self._pair(o); return a - b
    def __rsub__(self, o): a, b = self._pair(o); return b - a
    def __truediv__(self, o): a, b = self._pair(o); return a / b
    def __rtruediv__(self, o): a, b = self._pair(o); return b / a
    def __neg__(self): return -self._rgba


_FORMAT_CHANNELS = {"RGBA32Float": 4, "RG32Float": 2, "R32Float": 1,
                    "RGBA8Unorm": 4, "R8Unorm": 1}


@register_pass("ImageEquation")
class ImageEquation(RenderPass):
    SCHEMA = dict(formula="I0[xy]", format="RGBA32Float")

    MAX_INPUTS = 4

    def reflect(self, ctx):
        r = PassReflection()
        for i in range(self.MAX_INPUTS):
            r.add_input(f"I{i}", optional=True)
        return r.add_output("out")

    def execute(self, ctx, inputs, state=None):
        # the term language of the reference (ImageEquation term parser,
        # ImageEquation.cpp:73-77) as python-expression eval: inputs I0..I3,
        # math functions, pixel coordinates x/y and the clock time — enough
        # to express full-screen procedural shaders (samples/ShaderToy.py)
        xg = jnp.broadcast_to(
            jnp.arange(ctx.width, dtype=jnp.float32)[None, :],
            (ctx.height, ctx.width))
        yg = jnp.broadcast_to(
            jnp.arange(ctx.height, dtype=jnp.float32)[:, None],
            (ctx.height, ctx.width))

        def _vec(*chans):
            return jnp.stack([jnp.broadcast_to(jnp.asarray(c, jnp.float32),
                                               (ctx.height, ctx.width))
                              for c in chans], axis=-1)

        env = {"xy": None, "abs": jnp.abs, "min": jnp.minimum,
               "max": jnp.maximum, "sqrt": jnp.sqrt, "pow": jnp.power,
               "sin": jnp.sin, "cos": jnp.cos, "exp": jnp.exp,
               "floor": jnp.floor, "frac": lambda a: a - jnp.floor(a),
               "x": xg, "y": yg, "time": jnp.asarray(ctx.time, jnp.float32),
               "float2": _vec, "float3": _vec, "float4": _vec}
        for k, v in inputs.items():
            env[k] = _Img(v)
        result = eval(self.cfg["formula"], {"__builtins__": {}}, env)  # noqa: S307
        if isinstance(result, _Img):
            result = result._rgba
        result = jnp.asarray(result, jnp.float32)
        if result.ndim == 2:
            result = result[..., None]
        n = _FORMAT_CHANNELS.get(self.cfg["format"], 4)
        h, w, c = result.shape
        if c < n:
            fill = [result[..., i] if i < c else
                    (jnp.ones((h, w)) if i == 3 else jnp.zeros((h, w)))
                    for i in range(n)]
            result = jnp.stack(fill, -1)
        return {"out": result[..., :n]}, None


@register_pass("Switch")
class Switch(RenderPass):
    """N-to-1 runtime output selector (reference Switch.cpp:87-94)."""

    SCHEMA = dict(count=2, selected=0, i0="Default", i1="", i2="", i3="")

    def reflect(self, ctx):
        r = PassReflection()
        for i in range(int(self.cfg["count"])):
            r.add_input(f"i{i}")
        return r.add_output("out")

    def execute(self, ctx, inputs, state=None):
        return {"out": inputs[f"i{int(self.cfg['selected'])}"]}, None
