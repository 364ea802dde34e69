"""The render-pass contract, re-imagined for JAX.

Reference: RenderPass base interface (Source/Falcor/RenderGraph/RenderPass.h:
151-235) — reflect/compile/execute/setScene/getProperties — and the plugin
registry (Source/Falcor/Core/Plugin.h, FALCOR_PLUGIN_CLASS registration e.g.
SVAO.cpp:65-68).

TPU-native shape: a pass's `execute` must be trace-pure — given
(ctx, inputs, state) it returns (outputs, new_state) using only jnp ops and
static host config, so a whole graph can run under one `jax.jit`. Temporal
passes (TAA, TemporalAO, AccumulatePass) carry their history in `state`
pytrees instead of persistent textures.

Resource allocation/reflection (RenderPassReflection.h:42-171,
ResourceCache.h:43) collapses to channel-name bookkeeping: XLA owns buffers.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable

log = logging.getLogger("rtsdm")

PASS_REGISTRY: dict[str, type] = {}


def register_pass(name: str):
    """FALCOR_PLUGIN_CLASS + registerPlugin equivalent (SVAO.cpp:65-68)."""

    def deco(cls):
        cls.pass_type = name
        PASS_REGISTRY[name] = cls
        return cls

    return deco


def create_pass(pass_type: str, props: dict | None = None):
    """RenderGraph::createPass plugin lookup (RenderGraph.h:96)."""
    if pass_type not in PASS_REGISTRY:
        raise KeyError(f"unknown render pass type '{pass_type}' "
                       f"(registered: {sorted(PASS_REGISTRY)})")
    return PASS_REGISTRY[pass_type](props or {})


@dataclasses.dataclass
class ChannelDesc:
    name: str
    desc: str = ""
    optional: bool = False


@dataclasses.dataclass
class PassReflection:
    """reflect() result (RenderPassReflection field DSL,
    RenderPassReflection.h:92-135)."""
    inputs: list[ChannelDesc] = dataclasses.field(default_factory=list)
    outputs: list[ChannelDesc] = dataclasses.field(default_factory=list)

    def add_input(self, name, desc="", optional=False):
        self.inputs.append(ChannelDesc(name, desc, optional))
        return self

    def add_output(self, name, desc="", optional=False):
        self.outputs.append(ChannelDesc(name, desc, optional))
        return self

    def input_names(self):
        return [c.name for c in self.inputs]

    def output_names(self):
        return [c.name for c in self.outputs]


@dataclasses.dataclass
class RenderContext:
    """Per-frame execution context.

    width/height: full render resolution (includes the guard band region).
    dictionary: the inter-pass scalar dictionary (InternalDictionary.h; e.g.
    guardBand, GuardBand.cpp:58-62). Host-static values only — anything traced
    flows through channels.
    """
    width: int
    height: int
    scene: Any = None
    frame_index: Any = 0           # traced int32 under jit
    time: Any = 0.0
    dictionary: dict = dataclasses.field(default_factory=dict)
    profiler: Any = None
    # PixelDebug analogue (reference Utils/Debug/PixelDebug.h:65 — a
    # shader `print()` gated to one selected pixel): when `pixel_debug` is
    # set to (x, y), passes call ctx.debug_print(name, arr) on per-pixel
    # intermediates; the selected texel is sliced INSIDE the jit (one
    # dynamic_slice — no full-array readback) and surfaced through the
    # frame outputs under '__pixel_debug__'. None = zero overhead (the
    # call is a trace-time no-op).
    pixel_debug: Any = None        # (x, y) host ints or None
    debug_log: list = dataclasses.field(default_factory=list)
    # set by RenderGraph.execute before each pass runs: the output channels
    # of the CURRENT pass that are actually consumed (out-edges + marked
    # outputs). None = unknown (standalone pass execution) — produce
    # everything. Passes with expensive optional outputs (PathTracer's NRD
    # channel set re-traces primary visibility) gate on this to skip dead
    # work in eager mode and dead trace/compile work under jit.
    consumed_outputs: Any = None   # frozenset[str] | None

    @property
    def guard_band(self) -> int:
        return int(self.dictionary.get("guardBand", 0))

    def debug_print(self, name: str, arr) -> None:
        """Record `arr[y, x(, :)]` at the selected debug pixel (trace-time
        no-op when pixel debugging is off)."""
        if self.pixel_debug is None or not hasattr(arr, "ndim") \
                or arr.ndim < 2:
            return
        import jax.numpy as jnp
        x, y = self.pixel_debug
        y = min(max(int(y), 0), arr.shape[0] - 1)
        x = min(max(int(x), 0), arr.shape[1] - 1)
        self.debug_log.append((name, arr[y, x]))


class RenderPass:
    """Base class. Subclasses override reflect()/execute(); config is consumed
    in __init__ via Properties.consume (host-static -> shader-define
    equivalent: changing it retraces, mirroring requestRecompile,
    SVAO.cpp:649)."""

    pass_type = "RenderPass"
    # key -> default; consumed from the constructor dict
    SCHEMA: dict[str, Any] = {}

    def __init__(self, props: dict | None = None):
        from ..core.properties import Properties
        self.cfg = Properties(props or {}).consume(dict(self.SCHEMA), self.pass_type)
        self.scene = None
        self.name = self.pass_type  # instance name assigned by graph.add_pass

    # --- contract -------------------------------------------------------
    def reflect(self, ctx: RenderContext) -> PassReflection:
        return PassReflection()

    def unused_inputs(self, ctx: RenderContext):
        """Declared inputs this pass will IGNORE under its current config
        (the jax analogue of the reference's DefineList specialization:
        SVAO only reads depth2 under PRIMARY_DEPTH_MODE == DUAL,
        SVAO.cpp:221-238). The graph drops edges into these channels and
        liveness-prunes producers that then feed nothing — matching
        RenderGraphCompiler::resolveExecutionOrder, which only executes
        passes contributing to marked outputs
        (RenderGraphCompiler.cpp:121-157)."""
        return ()

    def set_scene(self, scene):
        self.scene = scene

    def init_state(self, ctx: RenderContext):
        """Initial temporal-state pytree (None for stateless passes)."""
        return None

    def execute(self, ctx: RenderContext, inputs: dict, state=None):
        """Returns (outputs: dict, new_state)."""
        raise NotImplementedError

    def get_properties(self) -> dict:
        """Round-trip config (RenderPass.h:189; used by graph save/load)."""
        return dict(self.cfg)

    # --- UI (headless renderUI analogue) --------------------------------
    # The reference's RenderPass::renderUI(Gui::Widgets&) draws ImGui
    # controls per pass (RenderPass.h:214, Utils/UI/Gui.h). Headless, the
    # same information is a declarative widget tree: auto-derived from
    # SCHEMA + live cfg, refined by optional class hints. tools/ui_panel.py
    # renders the tree to an HTML control panel and applies edited values
    # back through Properties (the full renderUI -> var -> recompile loop).
    UI_CHOICES: dict[str, list] = {}   # key -> allowed values (dropdown)
    UI_RANGES: dict[str, tuple] = {}   # key -> (lo, hi) (slider)

    def render_ui(self) -> list[dict]:
        """Widget descriptors for this pass's live config."""
        widgets = []
        for key in self.SCHEMA:
            val = self.cfg.get(key, self.SCHEMA[key])
            w = dict(key=key, value=val, default=self.SCHEMA[key])
            if key in self.UI_CHOICES:
                w.update(kind="dropdown", choices=list(self.UI_CHOICES[key]))
            elif isinstance(val, bool):
                w.update(kind="checkbox")
            elif isinstance(val, (int, float)) and not isinstance(val, bool):
                w.update(kind="slider")
                if key in self.UI_RANGES:
                    w["min"], w["max"] = self.UI_RANGES[key]
            else:
                w.update(kind="text", value=repr(val) if not
                         isinstance(val, str) else val)
            widgets.append(w)
        return widgets

    def apply_ui(self, edits: dict) -> bool:
        """Apply {key: value} edits from an (edited) widget tree; returns
        True if anything changed (static config -> the next frame_fn build
        retraces, the requestRecompile analogue, SVAO.cpp:649)."""
        changed = False
        for key, val in edits.items():
            if key not in self.SCHEMA:
                raise KeyError(f"{self.pass_type}: unknown UI key '{key}'")
            if self.UI_CHOICES.get(key) and val not in self.UI_CHOICES[key]:
                raise ValueError(f"{self.pass_type}.{key}: '{val}' not in "
                                 f"{self.UI_CHOICES[key]}")
            cur = self.cfg.get(key)
            cast = type(self.SCHEMA[key])
            if cur is not None and not isinstance(val, cast) \
                    and not isinstance(self.SCHEMA[key], bool):
                try:
                    val = cast(val)
                except (TypeError, ValueError):
                    pass
            if val != cur:
                self.cfg[key] = val
                changed = True
        return changed

    def __repr__(self):
        return f"<{self.pass_type} '{self.name}'>"
