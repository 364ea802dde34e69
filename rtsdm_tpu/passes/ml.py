"""ML-experiment passes.

References:
  VAOExport (Source/RenderPasses/VAOExport/VAOExport.cpp:57-62) — numpy
    training-data exporter for the SVAO neural-net experiments,
  ConvolutionalNet (Source/RenderPasses/ConvolutionalNet/, weights from .npy,
    shader codegen NeuralNetDefines.slangh; SVAO/NeuralNet.h:6-84) — CNN
    inference on AO channels.

TPU design: the CNN runs as bf16 lax.conv_general_dilated stacks — the one
place in the pipeline that uses the MXU directly (the reference generates
unrolled shader code instead)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass


@register_pass("VAOExport")
class VAOExport(RenderPass):
    """Dumps the wired channels as .npy per frame (training-data capture)."""

    SCHEMA = dict(outputDir="/tmp/vao_export", prefix="vao", enabled=True)

    CHANNELS = ["bright", "dark", "depth", "normals", "ao", "requireRay",
                "invDepth", "ref", "importance"]

    def reflect(self, ctx):
        r = PassReflection()
        for c in self.CHANNELS:
            r.add_input(c, optional=True)
        # the reference marks VAOExport.dummy as a graph output so the
        # export pass executes (scripts/SAVO_record.py:145)
        return r.add_output("dummy")

    def execute(self, ctx, inputs, state=None):
        if self.cfg["enabled"] and inputs:
            os.makedirs(self.cfg["outputDir"], exist_ok=True)
            out_dir, prefix = self.cfg["outputDir"], self.cfg["prefix"]
            keys = sorted(inputs)

            def _dump(frame_index, *arrays):
                fi = int(frame_index)
                for k, v in zip(keys, arrays):
                    np.save(os.path.join(out_dir, f"{prefix}_{k}_{fi}.npy"),
                            np.asarray(v, np.float32))

            # host-side export: inputs are tracers under the frame jit, so
            # the .npy dump must ride an io_callback (ordered: frames land
            # on disk in submission order)
            from jax.experimental import io_callback
            io_callback(_dump, None,
                        jnp.asarray(ctx.frame_index, jnp.int32),
                        *[inputs[k] for k in keys], ordered=True)
        return {"dummy": jnp.zeros((1, 1))}, None


@register_pass("ConvolutionalNet")
class ConvolutionalNet(RenderPass):
    """Small CNN on image channels. Weights: an .npz with conv kernels
    w0..wN [kh,kw,cin,cout] and biases b0..bN; identity (pass-through) when
    no weights file is configured. Runs in bf16 on the MXU."""

    SCHEMA = dict(weights="", kernel=3, relu=True)

    def __init__(self, props=None):
        super().__init__(props)
        self._layers = None
        if self.cfg["weights"] and os.path.exists(self.cfg["weights"]):
            z = np.load(self.cfg["weights"])
            n = len([k for k in z.files if k.startswith("w")])
            self._layers = [(jnp.asarray(z[f"w{i}"], jnp.bfloat16),
                             jnp.asarray(z[f"b{i}"], jnp.bfloat16))
                            for i in range(n)]

    def reflect(self, ctx):
        # two wiring forms: the generic single 'input', or the reference
        # SAVO_record form — deinterleaved bright/dark/importance/depth
        # feature planes in, refined AO 'out' (SVAO/NeuralNet.h:6-84,
        # reference scripts/SAVO_record.py:82-100)
        return (PassReflection().add_input("input", optional=True)
                .add_input("bright", optional=True)
                .add_input("dark", optional=True)
                .add_input("importance", optional=True)
                .add_input("depth", optional=True)
                .add_output("output").add_output("out"))

    def execute(self, ctx, inputs, state=None):
        if "input" not in inputs and "bright" in inputs:
            feats = [inputs[k] for k in ("bright", "dark", "importance",
                                         "depth") if k in inputs]
            feats = [f[..., 0] if f.ndim == 4 and f.shape[-1] == 1 else f
                     for f in feats]
            x = jnp.stack(feats, -1)          # [..., C] feature planes
            if self._layers is None:
                # untrained net = identity on the bright AO channel
                out = inputs["bright"]
                return {"output": out, "out": out}, None
            if x.ndim == 4:                   # deinterleaved [16,qh,qw,C]
                out = jax.vmap(lambda s: self._run(s))(x)
                out = out[..., 0] if out.shape[-1] == 1 else out
                return {"output": out, "out": out}, None
            out = self._run(x)
            out = out[..., 0] if out.shape[-1] == 1 else out
            return {"output": out, "out": out}, None
        x = inputs["input"]
        if self._layers is None:
            return {"output": x, "out": x}, None
        squeeze = x.ndim == 2
        if squeeze:
            x = x[..., None]
        y = x.astype(jnp.bfloat16)[None]  # NHWC
        for i, (w, b) in enumerate(self._layers):
            y = jax.lax.conv_general_dilated(
                y, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            y = y + b
            if self.cfg["relu"] and i + 1 < len(self._layers):
                y = jnp.maximum(y, 0)
        out = y[0].astype(jnp.float32)
        out = out[..., 0] if squeeze and out.shape[-1] == 1 else out
        return {"output": out, "out": out}, None

    def _run(self, x):
        """[H,W,C] -> [H,W,Cout] through the conv stack (bf16 MXU)."""
        y = x.astype(jnp.bfloat16)[None]
        for i, (w, b) in enumerate(self._layers):
            y = jax.lax.conv_general_dilated(
                y, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            y = y + b
            if self.cfg["relu"] and i + 1 < len(self._layers):
                y = jnp.maximum(y, 0)
        return y[0].astype(jnp.float32)
