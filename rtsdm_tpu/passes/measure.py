"""Measurement & recording passes.

References (Source/RenderPasses/...):
  ErrorMeasurePass/ErrorMeasurePass.h:36 — per-frame error vs a reference
  FLIPPass/FLIPPass.h:37                — FLIP perceptual metric in-graph
  PathBenchmark/PathBenchmark.cpp:59-90 — per-event GPU times along a camera
                                          path, CSV export
  PathRecorder / VideoRecorder          — record & replay camera paths
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..rendergraph.render_pass import PassReflection, RenderPass, register_pass
from ..utils import compare as C


def _concrete(*xs) -> bool:
    """True when no argument is a JAX tracer — host-side capture (python
    list appends) must only happen on concrete values; under whole-graph
    jit the same measurements flow through the pass STATE instead (the
    'execute must be trace-pure' contract, rendergraph/render_pass.py)."""
    return not any(isinstance(x, jax.core.Tracer)
                   for x in jax.tree_util.tree_leaves(xs))


@register_pass("ErrorMeasurePass")
class ErrorMeasurePass(RenderPass):
    SCHEMA = dict(ReferenceImagePath="", MeasureOnlyOnReference=False,
                  UseLoadedReference=False, ReportRunningError=True,
                  RunningErrorSigma=0.995, SelectedOutputId="Source")

    def __init__(self, props=None):
        super().__init__(props)
        self._ref = None
        if self.cfg["ReferenceImagePath"]:
            p = str(self.cfg["ReferenceImagePath"])
            if p.endswith(".npy"):
                self._ref = jnp.asarray(np.load(p).astype(np.float32))
        self.measurements: list[dict] = []

    def reflect(self, ctx):
        return (PassReflection().add_input("Source")
                .add_input("Reference", optional=True)
                .add_input("WorldPosition", optional=True)
                .add_output("Output"))

    def execute(self, ctx, inputs, state=None):
        src = inputs["Source"]
        ref = inputs.get("Reference", self._ref)
        if ref is None:
            return {"Output": src}, None
        diff = (src[..., :3] if src.ndim == 3 else src) - \
               (ref[..., :3] if ref.ndim == 3 else ref)
        err = diff * diff
        mse = jnp.mean(err)
        if _concrete(mse):
            self.measurements.append({"mse": float(mse)})
        # under jit the measurement is the pass state: callers read it from
        # the state returned by graph.execute / frame_fn
        return {"Output": err}, {"mse": mse}


@register_pass("FLIPPass")
class FLIPPass(RenderPass):
    SCHEMA = dict(useMagma=True, monitorWidthPixels=3840,
                  monitorDistanceMeters=0.7)

    def reflect(self, ctx):
        return (PassReflection().add_input("testImage")
                .add_input("referenceImage").add_output("errorMap"))

    def execute(self, ctx, inputs, state=None):
        err = C.flip_error(inputs["testImage"], inputs["referenceImage"])
        return {"errorMap": err}, None


@register_pass("PathBenchmark")
class PathBenchmark(RenderPass):
    """Pass-through that records per-frame profiler averages; csv() exports
    the PathBenchmark-style table (PathBenchmark.cpp:59-90)."""

    SCHEMA = dict()

    def __init__(self, props=None):
        super().__init__(props)
        self.rows: list[dict] = []

    def reflect(self, ctx):
        return PassReflection()

    def execute(self, ctx, inputs, state=None):
        # profiler rows are host data; under whole-graph jit there is one
        # trace (no per-frame timings) — skip rather than record tracers
        if ctx.profiler is not None:
            row = dict(ctx.profiler.flat_averages())
            if _concrete(row):
                self.rows.append(row)
        return {}, None

    def csv(self) -> str:
        if not self.rows:
            return ""
        keys = sorted({k for r in self.rows for k in r})
        lines = [",".join(["frame"] + keys)]
        for i, r in enumerate(self.rows):
            lines.append(",".join([str(i)] + [f"{r.get(k, 0.0):.4f}" for k in keys]))
        return "\n".join(lines)


@register_pass("PathRecorder")
class PathRecorder(RenderPass):
    """Records the camera path per frame; save()/load() round-trips .npz
    (PathRecorder.h). Replay drives the harness camera."""

    SCHEMA = dict()

    def __init__(self, props=None):
        super().__init__(props)
        self.keyframes: list[tuple] = []

    def reflect(self, ctx):
        return PassReflection()

    def execute(self, ctx, inputs, state=None):
        cam = ctx.scene.camera
        if _concrete(cam.pos_w):
            self.keyframes.append((np.asarray(cam.pos_w),
                                   np.asarray(cam.target),
                                   np.asarray(cam.up)))
        return {}, None

    def save(self, path):
        arr = np.asarray(self.keyframes, np.float32)
        np.savez(path, keyframes=arr)

    @staticmethod
    def load(path):
        return np.load(path)["keyframes"]


@register_pass("VideoRecorder")
class VideoRecorder(RenderPass):
    """Captures a chosen channel every frame into an in-memory list (the
    reference drives ffmpeg; here frames are retrievable / dumpable as npy,
    VideoRecorder.h:42)."""

    SCHEMA = dict(channel=None)

    def __init__(self, props=None):
        super().__init__(props)
        self.frames: list[np.ndarray] = []
        self.recording = False

    def reflect(self, ctx):
        return PassReflection().add_input("in", optional=True)

    def execute(self, ctx, inputs, state=None):
        if self.recording and "in" in inputs and _concrete(inputs["in"]):
            self.frames.append(np.asarray(inputs["in"]))
        return {}, None
