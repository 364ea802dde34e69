"""rtsdm_tpu — a TPU-native re-implementation of the Falcor fork
"Ray Traced Stochastic Depth Map for Ambient Occlusion"
(TU-Clausthal-Rendering/Ray-Traced-Stochastic-Depth-Map).

This is NOT a port: the reference is a C++/Slang D3D12 renderer; this package
re-designs the same capabilities (SVAO, stochastic depth maps, the supporting
render-pass library, the render-graph runtime, and the Mogwai-style script
harness) as pure-functional JAX/XLA/Pallas programs for TPU.

Layer map (mirrors reference SURVEY §1, re-imagined):
  scene/        — Scene arrays + camera pytree   (ref: Source/Falcor/Scene/)
  ops/          — raster / ray / blur kernels    (ref: Slang shaders)
  rendergraph/  — pass protocol + DAG execution  (ref: Source/Falcor/RenderGraph/)
  passes/       — the render-pass library        (ref: Source/RenderPasses/)
  core/         — clock, profiler, capture, properties (ref: Utils/Timing, Mogwai ext.)
  parallel/     — multi-chip screen-tile sharding (no reference equivalent; TPU mesh)
  mogwai.py     — script-driven harness           (ref: Source/Mogwai/)
  falcor.py     — `from falcor import *` compat surface (ref: FalcorPython.cpp)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Platform override: the axon sitecustomize force-registers the TPU backend
# and clobbers JAX_PLATFORMS, so an env var is the only way to force CPU from
# a CLI entry point (e.g. when the TPU tunnel is unavailable).  Honored here
# because this package import is the first thing every entry point does.
if _os.environ.get("RTSDM_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["RTSDM_PLATFORM"])

# Renderer-wide precision policy: geometry transforms must stay true float32 —
# TPU's default bf16 MXU passes put ~0.4% error on ndc depth, which the
# linearize step amplifies by ~far/near. Kernels that want bf16 throughput
# (e.g. the ConvolutionalNet pass) opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
