"""`from falcor import *` compatibility surface.

The reference's graph scripts start with `from falcor import *`
(e.g. scripts/SVAO.py:2; bindings PYBIND11_MODULE falcor_ext,
Source/Falcor/FalcorPython.cpp:52). This module provides the same names on
top of the TPU engine and installs itself as `falcor` in sys.modules so the
reference-shaped scripts execute verbatim.
"""
from __future__ import annotations

import sys

from .rendergraph.graph import RenderGraph  # noqa: F401
from .rendergraph.render_pass import create_pass, PASS_REGISTRY  # noqa: F401
from . import passes  # noqa: F401  (registers all pass types)

# Falcor exposes enums; scripts pass them as strings in Properties — our
# passes consume strings directly. Provide common names as str aliases so
# scripts that reference them unqualified still run.
uint2 = tuple
uint3 = tuple
float2 = tuple
float3 = tuple
float4 = tuple


class ResourceFormat:
    def __getattr__(self, name):
        return name


class Testbed:
    """Windowless scriptable app shim (reference Core/Testbed.h:75; used by
    the python test rigs, e.g. scripts/python/test_pytorch.py): wraps the
    headless Renderer with the Testbed's createRenderGraph/renderGraph
    surface."""

    def __init__(self, width: int = 256, height: int = 256):
        from .mogwai import Renderer
        self._renderer = Renderer(width=width, height=height, use_jit=False)
        self.renderGraph = None

    def createRenderGraph(self, name: str):
        g = RenderGraph(name)
        g.createPass = lambda pname, ptype, props=None: (
            g.create_pass(pname, ptype, props or {}))
        return g

    def loadScene(self, path: str):
        self._renderer.loadScene(path)

    def frame(self):
        if self.renderGraph is not None \
                and self.renderGraph not in self._renderer.graphs:
            self._renderer.addGraph(self.renderGraph)
        return self._renderer.renderFrame()


def createPass(pass_type: str, props: dict | None = None):
    """Upstream binding name (RenderPass factory): scripts do
    `p = createPass("AccumulatePass", {...}); g.addPass(p, "name")`
    (reference scripts/MinimalPathTracer.py:5-10)."""
    return create_pass(pass_type, props)


__all__ = ["RenderGraph", "create_pass", "createPass", "Testbed", "uint2",
           "uint3", "float2", "float3", "float4", "ResourceFormat"]

sys.modules.setdefault("falcor", sys.modules[__name__])
