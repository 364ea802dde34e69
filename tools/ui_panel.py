"""Headless control-panel for the renderUI tree.

The reference renders per-pass ImGui controls every frame
(RenderPass::renderUI, Source/Falcor/Utils/UI/Gui.h; Mogwai's graph UI).
Headless, the same loop is: dump the declarative widget tree to a
self-contained HTML panel (inspect/edit in any browser), then apply an
edited values JSON back onto the renderer and re-render.

Usage:
  python tools/ui_panel.py scripts/HBAO.py --out /tmp/panel.html
  python tools/ui_panel.py scripts/HBAO.py --apply edits.json \
      --scene CornellBox --capture /tmp/out     # re-render with edits

edits.json: {"<graph>": {"<pass>": {"<key>": value, ...}}}
"""
import argparse
import html
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def widget_html(w):
    key = html.escape(str(w["key"]))
    val = w["value"]
    kind = w["kind"]
    if kind == "checkbox":
        chk = "checked" if val else ""
        inp = f'<input type="checkbox" name="{key}" {chk}>'
    elif kind == "dropdown":
        opts = "".join(
            f'<option {"selected" if c == val else ""}>{html.escape(str(c))}'
            f"</option>" for c in w["choices"])
        inp = f'<select name="{key}">{opts}</select>'
    elif kind == "slider" and "min" in w:
        step = (w["max"] - w["min"]) / 200.0
        inp = (f'<input type="range" name="{key}" min="{w["min"]}" '
               f'max="{w["max"]}" step="{step}" value="{val}">'
               f"<code>{val}</code>")
    elif kind == "slider":
        inp = f'<input type="number" name="{key}" value="{val}">'
    else:
        inp = (f'<input type="text" name="{key}" '
               f'value="{html.escape(str(val))}">')
    return (f'<label class="w"><span>{key}</span>{inp}'
            f'<small>default: {html.escape(str(w["default"]))}</small>'
            f"</label>")


def panel_html(tree):
    parts = ["""<!doctype html><meta charset="utf-8">
<title>rtsdm_tpu control panel</title><style>
body{font:14px system-ui;margin:2em;max-width:70em}
details{border:1px solid #ccc;border-radius:6px;margin:.4em 0;padding:.4em}
summary{font-weight:600;cursor:pointer}
label.w{display:grid;grid-template-columns:16em 1fr 12em;gap:.6em;
        align-items:center;padding:.15em 0}
small{color:#888}</style>"""]
    clock = tree["clock"]
    scene = tree["scene"]
    parts.append(
        f"<h1>rtsdm_tpu</h1><p>scene <b>{html.escape(str(scene['name']))}</b>"
        f" ({scene['triangles']} tris) · {tree['resolution'][0]}×"
        f"{tree['resolution'][1]} · t={clock['time']:.3f}s"
        f" {'⏸' if clock['paused'] else '▶'} @ {clock['framerate']} fps</p>")
    for gname, passes in tree["graphs"].items():
        parts.append(f"<h2>graph: {html.escape(gname)}</h2>")
        for pname, widgets in passes.items():
            body = "".join(widget_html(w) for w in widgets) or "<i>no knobs</i>"
            parts.append(f"<details><summary>{html.escape(pname)}</summary>"
                         f"{body}</details>")
    parts.append("<p><i>Edit values, save as edits.json "
                 '{"graph": {"pass": {"key": value}}} and run with '
                 "--apply.</i></p>")
    return "\n".join(parts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("script")
    ap.add_argument("--out", help="write the HTML panel here")
    ap.add_argument("--json", help="also dump the raw widget tree JSON")
    ap.add_argument("--apply", help="edits JSON to apply before rendering")
    ap.add_argument("--scene", default=None)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--capture", help="render one frame with edits applied "
                                      "and capture outputs here")
    args = ap.parse_args(argv)

    from rtsdm_tpu.mogwai import Renderer, run_script
    m = Renderer(width=args.width, height=args.height)
    run_script(args.script, m)
    if args.scene:
        m.loadScene(args.scene)

    if args.apply:
        with open(args.apply) as f:
            edits = json.load(f)
        changed = m.applyUI(edits)
        print(f"applied {args.apply}: changed={changed}")

    tree = m.renderUI()
    if args.json:
        with open(args.json, "w") as f:
            json.dump(tree, f, indent=1, default=str)
        print(f"wrote {args.json}")
    if args.out:
        with open(args.out, "w") as f:
            f.write(panel_html(tree))
        print(f"wrote {args.out}")

    if args.capture:
        m.frameCapture.outputDir = args.capture
        m.renderFrame()
        m.frameCapture.capture()
        print(f"captured to {args.capture}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
