"""Headless RenderGraphEditor analogue.

The reference ships a GUI graph editor (Source/Tools/RenderGraphEditor/ —
node canvas over the same RenderGraph script API). Headless, the editor is
a CLI over that API: load any graph script, inspect the topology, apply
add/remove pass & edge operations and output marks, validate (topo-sort +
channel reflection), and write the result back as a runnable script via the
ScriptWriter round-trip (core/script_writer.py).

Usage:
  python tools/graph_editor.py scripts/HBAO.py --show
  python tools/graph_editor.py scripts/HBAO.py \
      --add-pass Blur GaussianBlur '{"kernelWidth": 9}' \
      --add-edge Ambient.out Blur.src --remove-output Ambient.out \
      --mark-output Blur.dst --save /tmp/HBAO_blurred.py
Ops apply in the order given above (removals before adds of the same kind).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def show(graph):
    order = graph._execution_order()
    lines = [f"graph {graph.name!r}: {len(graph.passes)} passes, "
             f"{len(graph.edges)} edges"]
    for name in order:
        p = graph.passes[name]
        ins = [f"{sp}.{sc}->{dc}" for sp, sc, dp, dc in graph.edges
               if dp == name]
        lines.append(f"  {name} ({p.pass_type})"
                     + (f"  <- {', '.join(ins)}" if ins else ""))
    lines.append("outputs: " + ", ".join(graph.outputs))
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("script")
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--remove-pass", action="append", default=[],
                    metavar="NAME")
    ap.add_argument("--remove-edge", nargs=2, action="append", default=[],
                    metavar=("SRC.ch", "DST.ch"))
    ap.add_argument("--add-pass", nargs=3, action="append", default=[],
                    metavar=("NAME", "TYPE", "PROPS_JSON"))
    ap.add_argument("--add-edge", nargs=2, action="append", default=[],
                    metavar=("SRC.ch", "DST.ch"))
    ap.add_argument("--remove-output", action="append", default=[])
    ap.add_argument("--mark-output", action="append", default=[])
    ap.add_argument("--save", help="write the edited graph script here")
    args = ap.parse_args(argv)

    from rtsdm_tpu.core.script_writer import save_graph_script
    from rtsdm_tpu.mogwai import Renderer, run_script
    m = Renderer(width=64, height=64, use_jit=False)
    run_script(args.script, m)
    g = m.active_graph

    for name in args.remove_pass:
        g.remove_pass(name)
    for src, dst in args.remove_edge:
        g.edges = [e for e in g.edges
                   if not (f"{e[0]}.{e[1]}" == src and f"{e[2]}.{e[3]}" == dst)]
        g._order = None
    for name, ptype, props in args.add_pass:
        g.create_pass(name, ptype, json.loads(props))
    for src, dst in args.add_edge:
        g.add_edge(src, dst)
    for o in args.remove_output:
        g.unmark_output(o)
    for o in args.mark_output:
        g.mark_output(o)

    # validate: topo-sort must cover every pass (cycles/dangling fail here)
    order = g._execution_order()
    assert len(order) == len(g.passes)
    if args.show or not args.save:
        print(show(g))
    if args.save:
        save_graph_script(g, args.save)
        print(f"wrote {args.save}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
