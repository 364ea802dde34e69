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
