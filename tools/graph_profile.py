"""Per-pass marginal cost attribution for a whole-graph frame (VERDICT r2
item 2: the full `frame_fn` graph had never been profiled as a unit).

Method: for each prefix of the topo execution order, jit a function that runs
passes[:k+1] for K frames inside one `lax.scan` (frame_index varies per step
-> jitter/noise change -> the axon memoization stays honest, CLAUDE.md rules)
and returns a scalar sum of the last pass's outputs. Steady-state time of
prefix k minus prefix k-1 = marginal cost of pass k *in context* (including
the fusions it enables/blocks). A trivial-kernel floor is subtracted.

Usage: python tools/graph_profile.py [--config 1] [--frames 8] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp

from rtsdm_tpu.mogwai import Renderer, run_script
from rtsdm_tpu.rendergraph.render_pass import RenderContext

CONFIGS = {
    1: dict(script="scripts/HBAO.py", scene="CornellBox", width=256, height=256),
    2: dict(script="scripts/SVAO_small.py", scene="Arcade@full",
            width=1280, height=720,
            overrides={"SVAO": {"stochasticDepthImpl": "Raster"}}),
    3: dict(script="scripts/SVAO_small.py", scene="SunTemple@full",
            width=1920, height=1080,
            overrides={"SVAO": {"stochMapDivisor": 1, "stochMapGuardBand": 512}}),
    4: dict(script="scripts/SVAO_quarter.py", scene="Bistro@full",
            width=1920, height=1080),
    5: dict(script="scripts/SVAO_small.py", scene="EmeraldSquare@full",
            width=1280, height=720),
}


def _execute_prefix(graph, ctx, state, prefix):
    """graph.execute restricted to the passes in `prefix` (a topo-order
    prefix is closed under data deps)."""
    from collections import defaultdict
    produced = {}
    new_state = dict(state)
    in_edges = defaultdict(list)
    for sp, sc, dp, dc in graph.edges:
        in_edges[dp].append((dc, sp, sc))
    for name in prefix:
        p = graph.passes[name]
        inputs = {}
        for dc, sp, sc in in_edges[name]:
            if sp in produced and sc in produced[sp]:
                inputs[dc] = produced[sp][sc]
        outputs, ns = p.execute(ctx, inputs, state.get(name))
        produced[name] = outputs or {}
        if ns is not None:
            new_state[name] = ns
    return produced, new_state


def _floor_ms(reps=5):
    """Dispatch+readback floor: trivial kernel, varied input."""
    f = jax.jit(lambda x: (x * 2.0).sum())
    float(f(jnp.float32(1.0)))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(f(jnp.float32(i + 2.0)))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def profile(m: Renderer, frames=8, reps=3):
    graph = m.active_graph
    if m._frame_fn is None:
        m._build_frame_fn()
    order = graph._execution_order()
    rw, rh, gb = m._render_res()
    scene = m._scene_comp
    state0 = m._state
    floor = _floor_ms()
    rows = []
    prev_ms = 0.0
    for k in range(len(order)):
        prefix = tuple(order[:k + 1])

        def f(sc, st, f0, prefix=prefix):
            def step(carry, fi):
                # perturb a real INPUT per step: with a Center sample
                # pattern nothing else depends on fi, and XLA's
                # loop-invariant code motion hoists the ENTIRE graph out of
                # the scan — measured 8x under-report on config 1 (8.34 ms
                # "in-graph" vs 70.7 ms honest steady state)
                from rtsdm_tpu.utils.structs import replace
                s = 1.0 + 1e-7 * (f0 + fi).astype(jnp.float32)
                sc2 = replace(sc, positions=sc.positions * s)
                ctx = RenderContext(width=rw, height=rh, scene=sc2,
                                    frame_index=f0 + fi, time=0.0,
                                    dictionary={"guardBand": gb})
                produced, ns = _execute_prefix(graph, ctx, carry, prefix)
                acc = jnp.float32(0.0)
                for v in produced[prefix[-1]].values():
                    if hasattr(v, "dtype"):
                        acc = acc + jnp.sum(v.astype(jnp.float32))
                return ns, acc
            st, accs = jax.lax.scan(step, st, jnp.arange(frames))
            return accs.sum()

        jf = jax.jit(f)
        t0 = time.perf_counter()
        float(jf(scene, state0, 0))  # compile + run
        compile_s = time.perf_counter() - t0
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(jf(scene, state0, (r + 1) * frames))
            ts.append(time.perf_counter() - t0)
        total_ms = (min(ts) * 1e3 - floor) / frames
        rows.append(dict(pass_name=order[k],
                         pass_type=graph.passes[order[k]].pass_type,
                         cum_ms=round(total_ms, 2),
                         marginal_ms=round(total_ms - prev_ms, 2),
                         compile_s=round(compile_s, 1)))
        prev_ms = total_ms
        print(json.dumps(rows[-1]), flush=True)
    return rows, floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    c = CONFIGS[args.config]
    m = Renderer(width=c["width"], height=c["height"])
    run_script(c["script"], m)
    for pname, props in c.get("overrides", {}).items():
        m.active_graph.get_pass(pname).cfg.update(props)
    m.loadScene(c["scene"])
    m.clock.pause()
    rows, floor = profile(m, frames=args.frames, reps=args.reps)
    out = dict(config=args.config, floor_ms=round(floor, 2), rows=rows)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(dict(config=args.config, floor_ms=round(floor, 2),
                          total_ms=rows[-1]["cum_ms"] if rows else 0)))


if __name__ == "__main__":
    main()
