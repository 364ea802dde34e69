"""All shipped graph scripts must build and topo-sort cleanly (the reference
graphs' wiring contract, SURVEY §2.4)."""
import glob
import os

import pytest

from rtsdm_tpu.mogwai import Renderer, run_script

SCRIPTS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "scripts", "*.py")))
SCRIPTS = [s for s in SCRIPTS if not os.path.basename(s).startswith("_")]
# Sample apps (reference Source/Samples analogues) share the same contract.
SCRIPTS += sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                         "samples", "*.py")))


@pytest.mark.parametrize("script", SCRIPTS, ids=os.path.basename)
def test_script_builds(script):
    m = Renderer(width=64, height=64, use_jit=False)
    run_script(script, m)
    assert m.active_graph is not None
    order = m.active_graph._execution_order()
    assert len(order) == len(m.active_graph.passes)


def test_svao_depth_renders():
    m = Renderer(width=64, height=64, use_jit=False)
    run_script(os.path.join(os.path.dirname(__file__), "..", "scripts",
                            "SVAO_depth.py"), m)
    m.active_graph.get_pass("GuardBand").cfg["guardBand"] = 4
    for pn in ("GBufferRaster", "DepthPeeling"):
        m.active_graph.get_pass(pn).cfg["maxPerTile"] = 64
    m.active_graph.get_pass("SVAO_ref").cfg["rtChunk"] = 64
    m.loadScene("CornellBox")
    m.clock.pause()
    out = m.renderFrame()
    assert out["Ambient.out"].shape == (64, 64, 4)
    assert out["AmbientRef.out"].shape == (64, 64, 4)


REF_SCRIPTS = sorted(glob.glob("/root/reference/scripts/*.py"))


@pytest.mark.skipif(not REF_SCRIPTS, reason="reference scripts not mounted")
@pytest.mark.parametrize("script", REF_SCRIPTS, ids=os.path.basename)
def test_reference_script_runs_verbatim(script):
    """Every graph script shipped by the reference builds UNMODIFIED through
    the falcor shim (both API generations: the fork's g.create_pass/add_edge
    and upstream's createPass/addPass/markOutput) — the user-facing API
    contract (SURVEY §2.4)."""
    m = Renderer(width=64, height=64, use_jit=False)
    run_script(script, m)
    assert m.active_graph is not None
    order = m.active_graph._execution_order()
    assert len(order) == len(m.active_graph.passes)


REF_RENDER = [s for s in REF_SCRIPTS if os.path.basename(s) in
              ("SceneDebugger.py", "MinimalPathTracer.py",
               "SAVO_record.py", "PathTracerNRD.py")]


@pytest.mark.skipif(not REF_RENDER, reason="reference scripts not mounted")
@pytest.mark.parametrize("script", REF_RENDER, ids=os.path.basename)
def test_reference_script_renders_verbatim(script, tmp_path):
    """The upstream-API scripts also RENDER end-to-end unmodified (NRD
    demodulation channels, deinterleaved AO chain, bare SceneDebugger);
    the research-fork scripts are render-covered by the golden tier."""
    import numpy as np
    m = Renderer(width=48, height=48, use_jit=False)
    run_script(script, m)
    for p in m.active_graph.passes.values():
        if "outputDir" in p.SCHEMA:        # VAOExport writes files
            p.cfg["outputDir"] = str(tmp_path)
    m.loadScene("CornellBox")
    m.clock.pause()
    out = m.renderFrame()
    assert out
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_vao_export_under_jit(tmp_path):
    """VAOExport must work inside the jitted frame path (the default
    Renderer mode): its inputs are tracers, so the .npy dump rides an
    ordered io_callback (ref VAOExport.cpp:57-62)."""
    import numpy as np
    import jax

    from rtsdm_tpu.rendergraph.graph import RenderGraph

    m = Renderer(width=32, height=32, use_jit=True)
    g = RenderGraph("export")
    g.create_pass("AO", "SVAO", {"secondaryDepthMode": "SingleDepth"})
    g.create_pass("GB", "GBufferRaster", {})
    g.create_pass("Lin", "LinearizeDepth", {})
    g.create_pass("Export", "VAOExport", {"outputDir": str(tmp_path),
                                          "prefix": "t"})
    g.add_edge("GB.depth", "Lin.depth")
    g.add_edge("GB.depth", "AO.gbufferDepth")
    g.add_edge("Lin.linearDepth", "AO.depth")
    g.add_edge("GB.faceNormalW", "AO.normals")
    g.add_edge("AO.ao", "Export.ao")
    g.mark_output("Export.dummy")
    m.addGraph(g)
    m.loadScene("CornellBox")
    m.clock.pause()
    m.renderFrame()
    m.clock.step()  # paused clock keeps frame_index; advance explicitly
    m.renderFrame()
    jax.effects_barrier()
    files = sorted(p.name for p in tmp_path.iterdir())
    assert "t_ao_0.npy" in files and "t_ao_1.npy" in files, files
    a = np.load(tmp_path / "t_ao_0.npy")
    assert a.shape[:2] == (32, 32) and np.isfinite(a).all()
