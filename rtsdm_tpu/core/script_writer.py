"""Graph -> python script round-trip (reference RenderGraphImportExport /
ScriptWriter; Mogwai "save config", Mogwai.h:113). Every pass contributes its
getProperties() dict (RenderPass.h:189), so a saved script reconstructs the
graph exactly."""
from __future__ import annotations


def write_graph_script(graph) -> str:
    lines = ["from falcor import *", "",
             f"def render_graph_{graph.name}():",
             f"    g = RenderGraph({graph.name!r})"]
    for name, p in graph.passes.items():
        lines.append(f"    g.create_pass({name!r}, {p.pass_type!r}, "
                     f"{p.get_properties()!r})")
    for sp, sc, dp, dc in graph.edges:
        lines.append(f"    g.add_edge({sp + '.' + sc!r}, {dp + '.' + dc!r})")
    for sp, dp in graph.order_edges:
        lines.append(f"    g.add_edge({sp!r}, {dp!r})")
    for o in graph.outputs:
        lines.append(f"    g.mark_output({o!r})")
    lines += ["    return g", "",
              f"{graph.name} = render_graph_{graph.name}()",
              f"try: m.addGraph({graph.name})",
              "except NameError: None", ""]
    return "\n".join(lines)


def save_graph_script(graph, path: str):
    with open(path, "w") as f:
        f.write(write_graph_script(graph))
