"""Tools & aux subsystems: settings, script round-trip, compare metrics,
timing capture, profiler."""
import os
import tempfile

import numpy as np

from rtsdm_tpu.core.settings import Settings
from rtsdm_tpu.core.script_writer import write_graph_script
from rtsdm_tpu.utils import compare as C


def test_settings_options_and_filters():
    s = Settings()
    s.add_options({"renderer": {"quality": 3}})
    assert s.get_option("renderer:quality") == 3
    assert s.get_option("renderer:missing", 7) == 7
    s.add_filtered_attributes("Arcade*", {"rtao.radius": 0.5})
    assert s.get_attribute("ArcadeDay", "rtao.radius") == 0.5
    assert s.get_attribute("Bistro", "rtao.radius", 1.0) == 1.0


def test_graph_script_roundtrip():
    from rtsdm_tpu.mogwai import Renderer, run_script
    repo = os.path.join(os.path.dirname(__file__), "..")
    m = Renderer(64, 64, use_jit=False)
    run_script(os.path.join(repo, "scripts", "Forward.py"), m)
    txt = write_graph_script(m.active_graph)
    # the saved script must rebuild an identical graph
    m2 = Renderer(64, 64, use_jit=False)
    p = tempfile.mktemp(suffix=".py")
    open(p, "w").write(txt)
    run_script(p, m2)
    g1, g2 = m.active_graph, m2.active_graph
    assert list(g1.passes) == list(g2.passes)
    assert g1.edges == g2.edges and g1.outputs == g2.outputs
    for n in g1.passes:
        assert g1.passes[n].get_properties() == g2.passes[n].get_properties()


def test_compare_metrics():
    a = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    b = a.copy()
    assert C.compare(a, b, "mse") == 0.0
    assert C.compare(a, b, "ssim") > 0.999
    b2 = np.clip(a + 0.1, 0, 1)
    assert C.compare(a, b2, "mse") > 0.005
    assert C.compare(a, b2, "ssim") < C.compare(a, b, "ssim")
    assert C.compare(a, b2, "flip") > 0.0


def test_timing_capture(tmp_path):
    from rtsdm_tpu.mogwai import Renderer, run_script
    repo = os.path.join(os.path.dirname(__file__), "..")
    m = Renderer(48, 48, use_jit=False)
    run_script(os.path.join(repo, "scripts", "Forward.py"), m)
    m.loadScene("CornellBox")
    f = tmp_path / "times.txt"
    m.timingCapture.captureFrameTime(str(f))
    m.clock.pause()
    m.renderFrame()
    m.renderFrame()
    lines = open(f).read().strip().splitlines()
    assert len(lines) == 2 and float(lines[0]) > 0
