"""Headless renderUI analogue (RenderPass.render_ui/apply_ui, Renderer
.renderUI/applyUI, tools/ui_panel.py). Reference: RenderPass.h:214
renderUI(Gui::Widgets&) + Utils/UI/Gui.h — re-imagined as a declarative
widget tree with a round-trip apply path."""
import json
import os

import numpy as np
import pytest

from rtsdm_tpu.mogwai import Renderer, run_script

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def test_pass_widget_tree_derives_from_schema():
    from rtsdm_tpu.passes.tonemap import ToneMapper
    tm = ToneMapper({})
    widgets = {w["key"]: w for w in tm.render_ui()}
    assert set(widgets) == set(ToneMapper.SCHEMA)
    assert widgets["operator"]["kind"] == "dropdown"
    assert "Aces" in widgets["operator"]["choices"]
    assert widgets["autoExposure"]["kind"] == "checkbox"
    assert widgets["exposureCompensation"]["kind"] == "slider"
    assert widgets["exposureCompensation"]["min"] == -12.0


def test_apply_ui_changes_and_validates():
    from rtsdm_tpu.passes.tonemap import ToneMapper
    tm = ToneMapper({})
    assert tm.apply_ui({"operator": "Aces", "clamp": True}) is True
    assert tm.cfg["operator"] == "Aces" and tm.cfg["clamp"] is True
    assert tm.apply_ui({"operator": "Aces"}) is False  # no change
    with pytest.raises(ValueError):
        tm.apply_ui({"operator": "NotAnOperator"})
    with pytest.raises(KeyError):
        tm.apply_ui({"bogusKnob": 1})


def test_renderer_ui_roundtrip_affects_render():
    m = Renderer(width=32, height=32, use_jit=False)
    run_script(os.path.join(SCRIPTS, "HBAO.py"), m)
    m.loadScene("CornellBox")
    m.clock.pause()
    tree = m.renderUI()
    gname = next(iter(tree["graphs"]))
    assert tree["scene"]["triangles"] > 0
    assert any(w["key"] == "radius" for w in tree["graphs"][gname]["HBAO"])
    out0 = np.asarray(m.renderFrame()["Ambient.out"])
    # editing a static knob invalidates the compiled path and changes output
    changed = m.applyUI({gname: {"HBAO": {"radius": 0.05}}})
    assert changed and m._frame_fn is None
    out1 = np.asarray(m.renderFrame()["Ambient.out"])
    assert not np.allclose(out0, out1)


def test_ui_panel_tool(tmp_path):
    from tools.ui_panel import main as panel_main
    html_path = tmp_path / "panel.html"
    json_path = tmp_path / "tree.json"
    edits = tmp_path / "edits.json"
    edits.write_text(json.dumps({"HBAO": {"ToneMapper": {"operator": "Aces"}}}))
    rc = panel_main([os.path.join(SCRIPTS, "HBAO.py"),
                     "--out", str(html_path), "--json", str(json_path),
                     "--apply", str(edits),
                     "--scene", "CornellBox", "--width", "32",
                     "--height", "32"])
    assert rc == 0
    page = html_path.read_text()
    assert "<select" in page and "Aces" in page
    tree = json.loads(json_path.read_text())
    tm = {w["key"]: w for w in tree["graphs"]["HBAO"]["ToneMapper"]}
    assert tm["operator"]["value"] == "Aces"  # edits applied before dump


def test_graph_editor_roundtrip(tmp_path):
    """RenderGraphEditor analogue: edit a graph topology from the CLI, save
    via the ScriptWriter round-trip, and the edited script still builds and
    renders the new output."""
    from tools.graph_editor import main as editor_main
    out_script = tmp_path / "HBAO_blurred.py"
    rc = editor_main([os.path.join(SCRIPTS, "HBAO.py"),
                      "--add-pass", "Blur", "GaussianBlur",
                      '{"kernelWidth": 9}',
                      "--add-edge", "Ambient.out", "Blur.src",
                      "--mark-output", "Blur.dst",
                      "--save", str(out_script)])
    assert rc == 0
    m = Renderer(width=32, height=32, use_jit=False)
    run_script(str(out_script), m)
    m.loadScene("CornellBox")
    m.clock.pause()
    out = m.renderFrame()
    assert "Blur.dst" in out
