"""Render graph: DAG of passes, topo-sorted execution.

Reference: RenderGraph (Source/Falcor/RenderGraph/RenderGraph.h:59-302),
compiler topo-sort (RenderGraphCompiler.cpp:121-157), linear execution list
(RenderGraphExe.cpp:32-44).

TPU-native: "graph compilation" is just building the execution order; the
real compilation is XLA tracing the whole frame. `frame_fn()` returns a
pure function (scene, state, frame_index, time) -> (outputs, new_state)
suitable for jax.jit — the analogue of RenderGraphExe, but fused end-to-end
by the compiler instead of dispatched pass-by-pass.
"""
from __future__ import annotations

import contextlib
import logging
from collections import defaultdict, deque

from .render_pass import RenderContext, RenderPass, create_pass

log = logging.getLogger("rtsdm")


class RenderGraph:
    def __init__(self, name: str = "graph"):
        self.name = name
        self.passes: dict[str, RenderPass] = {}
        # data edges: (src_pass, src_chan, dst_pass, dst_chan)
        self.edges: list[tuple[str, str, str, str]] = []
        # pure execution-order edges: (src_pass, dst_pass)
        self.order_edges: list[tuple[str, str]] = []
        self.outputs: list[str] = []  # "Pass.channel"
        self.scene = None
        self._order: list[str] | None = None

    # --- construction API (RenderGraph.h:96,135,198) ----------------------
    def create_pass(self, name: str, pass_type: str, props: dict | None = None):
        p = create_pass(pass_type, props)
        return self.add_pass(p, name)

    def add_pass(self, p: RenderPass, name: str):
        if name in self.passes:
            raise ValueError(f"pass '{name}' already in graph")
        p.name = name
        if self.scene is not None:
            p.set_scene(self.scene)
        self.passes[name] = p
        self._order = None
        return p

    def remove_pass(self, name: str):
        self.passes.pop(name)
        self.edges = [e for e in self.edges if e[0] != name and e[2] != name]
        self.order_edges = [e for e in self.order_edges if name not in e]
        self.outputs = [o for o in self.outputs if o.split(".")[0] != name]
        self._order = None

    def add_edge(self, src: str, dst: str):
        if "." in src and "." in dst:
            sp, sc = src.split(".", 1)
            dp, dc = dst.split(".", 1)
            self.edges.append((sp, sc, dp, dc))
        else:
            self.order_edges.append((src.split(".")[0], dst.split(".")[0]))
        self._order = None

    def mark_output(self, name: str):
        if name not in self.outputs:
            self.outputs.append(name)

    def unmark_output(self, name: str):
        if name in self.outputs:
            self.outputs.remove(name)

    def set_scene(self, scene):
        self.scene = scene
        for p in self.passes.values():
            p.set_scene(scene)

    # camelCase aliases: upstream Falcor scripts use the newer binding names
    # (addPass/addEdge/markOutput, e.g. reference scripts/MinimalPathTracer
    # .py), while the research fork's generated scripts use snake_case —
    # both API surfaces run verbatim through the falcor shim.
    def addPass(self, p: RenderPass, name: str):
        return self.add_pass(p, name)

    def addEdge(self, src: str, dst: str):
        return self.add_edge(src, dst)

    def removeEdge(self, src: str, dst: str):
        self.edges = [e for e in self.edges
                      if not (f"{e[0]}.{e[1]}" == src
                              and f"{e[2]}.{e[3]}" == dst)]
        self.order_edges = [e for e in self.order_edges
                            if e != (src, dst)]
        self._order = None

    def markOutput(self, name: str):
        return self.mark_output(name)

    def unmarkOutput(self, name: str):
        return self.unmark_output(name)

    def removePass(self, name: str):
        return self.remove_pass(name)

    def getPass(self, name: str) -> RenderPass:
        return self.passes[name]

    def render_ui(self) -> dict:
        """Declarative UI tree for every pass (headless renderUI analogue;
        reference RenderGraphUI / RenderPass.h:214)."""
        return {name: p.render_ui() for name, p in self.passes.items()}

    def apply_ui(self, edits: dict) -> bool:
        """Apply {pass_name: {key: value}} edits; True if anything changed
        (callers must rebuild frame_fn — static config retraces)."""
        changed = False
        for pname, kv in edits.items():
            changed |= self.passes[pname].apply_ui(kv)
        return changed

    def get_pass(self, name: str) -> RenderPass:
        return self.passes[name]

    # --- compilation (RenderGraphCompiler.cpp:121-157) ---------------------
    def _execution_order(self) -> list[str]:
        if self._order is not None:
            return self._order
        deps = defaultdict(set)
        for sp, _, dp, _ in self.edges:
            deps[dp].add(sp)
        for sp, dp in self.order_edges:
            deps[dp].add(sp)
        # Kahn, stable by insertion order of passes
        indeg = {n: len(deps[n] & set(self.passes)) for n in self.passes}
        q = deque([n for n in self.passes if indeg[n] == 0])
        order = []
        rev = defaultdict(list)
        for d, srcs in deps.items():
            for s in srcs:
                if s in self.passes and d in self.passes:
                    rev[s].append(d)
        while q:
            n = q.popleft()
            order.append(n)
            for m in rev[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    q.append(m)
        if len(order) != len(self.passes):
            missing = set(self.passes) - set(order)
            raise RuntimeError(f"render graph has a cycle involving {missing}")
        self._order = order
        return order

    # --- execution (RenderGraphExe.cpp:32-44) ------------------------------
    def init_state(self, ctx: RenderContext) -> dict:
        state = {}
        for name in self._execution_order():
            s = self.passes[name].init_state(ctx)
            if s is not None:
                state[name] = s
        return state

    def execute(self, ctx: RenderContext, state: dict | None = None,
                external_inputs: dict | None = None):
        """Run all passes once. Returns (marked_outputs, all_channels, new_state).

        external_inputs: "Pass.channel" -> array, for graph-level setInput
        (used by SVAO's nested SD graph, reference SVAO.cpp:363-406).
        """
        state = state if state is not None else {}
        produced: dict[str, dict] = {}
        new_state = dict(state)
        # drop edges into channels the consumer's CONFIG ignores
        # (RenderPass.unused_inputs — the DefineList-specialization
        # analogue), then liveness-prune: only passes contributing to a
        # marked output (or side-effect passes that declare no outputs)
        # execute, matching the reference compiler
        # (RenderGraphCompiler::resolveExecutionOrder,
        # RenderGraphCompiler.cpp:121-157)
        unused = {name: frozenset(p.unused_inputs(ctx))
                  for name, p in self.passes.items()}
        eff_edges = [(sp, sc, dp, dc) for (sp, sc, dp, dc) in self.edges
                     if dc not in unused.get(dp, frozenset())]
        live = {o.split(".", 1)[0] for o in self.outputs}
        for name, p in self.passes.items():
            if not p.reflect(ctx).outputs:
                live.add(name)  # side-effect pass (GuardBand, recorders)
        changed = True
        while changed:
            changed = False
            for sp, sc, dp, dc in eff_edges:
                if dp in live and sp not in live:
                    live.add(sp)
                    changed = True

        in_edges = defaultdict(list)
        out_consumed = defaultdict(set)
        for sp, sc, dp, dc in eff_edges:
            if dp in live:
                in_edges[dp].append((dc, sp, sc))
                out_consumed[sp].add(sc)
        for o in self.outputs:
            op, oc = o.split(".", 1)
            out_consumed[op].add(oc)

        for name in self._execution_order():
            if name not in live:
                continue
            p = self.passes[name]
            inputs = {}
            for dc, sp, sc in in_edges[name]:
                src = produced.get(sp, {})
                if sc not in src:
                    raise KeyError(f"edge {sp}.{sc} -> {name}.{dc}: "
                                   f"'{sc}' not produced (has {list(src)})")
                inputs[dc] = src[sc]
            if external_inputs:
                for key, val in external_inputs.items():
                    kp, kc = key.split(".", 1)
                    if kp == name:
                        inputs[kc] = val
            refl = p.reflect(ctx)
            for ch in refl.inputs:
                if not ch.optional and ch.name not in inputs:
                    raise KeyError(
                        f"pass '{name}' ({p.pass_type}) missing required input "
                        f"'{ch.name}' — wired inputs: {sorted(inputs)}")
            prof = ctx.profiler.event(name) if ctx.profiler else contextlib.nullcontext()
            ctx.consumed_outputs = frozenset(out_consumed[name])
            with prof:
                outputs, ns = p.execute(ctx, inputs, state.get(name))
            ctx.consumed_outputs = None
            produced[name] = outputs or {}
            if ns is not None:
                new_state[name] = ns

        marked = {}
        for o in self.outputs:
            op, oc = o.split(".", 1)
            marked[o] = produced[op][oc]
        return marked, produced, new_state

    def frame_fn(self, width: int, height: int, dictionary: dict | None = None,
                 external_input_keys: tuple = (), pixel_debug=None):
        """Build a pure per-frame function for jax.jit.

        f(scene, state, frame_index, time, external_inputs) ->
            (marked_outputs, new_state)

        pixel_debug: optional (x, y) — passes' ctx.debug_print() values at
        that pixel ride along in marked['__pixel_debug__'] (the PixelDebug
        analogue, reference Utils/Debug/PixelDebug.h:65)."""
        dictionary = dict(dictionary or {})

        def f(scene, state, frame_index=0, time=0.0, external_inputs=None):
            ctx = RenderContext(width=width, height=height, scene=scene,
                                frame_index=frame_index, time=time,
                                dictionary=dict(dictionary),
                                pixel_debug=pixel_debug)
            marked, _, new_state = self.execute(ctx, state, external_inputs)
            if pixel_debug is not None and ctx.debug_log:
                marked = dict(marked)
                marked["__pixel_debug__"] = {
                    f"{i}:{n}": v for i, (n, v) in enumerate(ctx.debug_log)}
            return marked, new_state

        return f

    def get_output(self, name: str, produced: dict):
        op, oc = name.split(".", 1)
        return produced[op][oc]
