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


def test_settings_toml_option_file(tmp_path):
    p = tmp_path / "opts.toml"
    p.write_text('[renderer]\nquality = 5\nname = "fast"\n')
    s = Settings()
    s.add_options(str(p))
    assert s.get_option("renderer:quality") == 5
    assert s.get_option("renderer:name") == "fast"


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


def test_flip_full_metric_properties():
    """The full LDR-FLIP (Andersson et al. 2020, FLIPPass.cs.slang):
    identical images -> ~0; green-vs-blue (the normalization anchor) -> ~1;
    small perturbations land strictly between; error grows with distance."""
    import jax.numpy as jnp
    import numpy as np
    from rtsdm_tpu.utils.compare import flip_error

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (48, 48, 3)).astype(np.float32))
    zero = np.asarray(flip_error(img, img))
    assert zero.shape == (48, 48)
    assert zero.max() < 1e-3

    green = jnp.zeros((32, 32, 3)).at[..., 1].set(1.0)
    blue = jnp.zeros((32, 32, 3)).at[..., 2].set(1.0)
    gb = np.asarray(flip_error(green, blue))
    assert gb.mean() > 0.95  # the HyAB normalization anchor

    small = np.asarray(flip_error(img, jnp.clip(img + 0.05, 0, 1)))
    large = np.asarray(flip_error(img, jnp.clip(img + 0.3, 0, 1)))
    assert 0.0 < small.mean() < large.mean() < 1.0


def test_gltf_importer_roundtrip(tmp_path):
    """Dependency-free glTF 2.0 import: node TRS flattening, indexed
    triangles, pbrMetallicRoughness materials, alphaMode=MASK."""
    import base64
    import json
    import numpy as np
    from rtsdm_tpu.scene.importers import import_gltf, load_any

    # two triangles (an indexed quad), one node translated by (1,0,0)
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 0.0, 0.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorFactor": [0.2, 0.4, 0.6, 1.0],
                        "roughnessFactor": 0.5},
                       "alphaMode": "MASK", "doubleSided": True}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": idx.nbytes},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(doc))
    scene = import_gltf(str(p))
    assert scene.num_triangles == 2
    P = np.asarray(scene.positions).reshape(-1, 3)
    assert P[:, 0].min() >= 1.0 - 1e-6  # node translation applied
    assert np.allclose(np.asarray(scene.mat_base_color)[0], [0.2, 0.4, 0.6])
    assert int(np.asarray(scene.mat_alpha_mode)[0]) == 1
    assert bool(np.asarray(scene.mat_double_sided)[0])
    # dispatch through load_any
    scene2 = load_any(str(p))
    assert scene2.num_triangles == 2


def test_pbrt_importer(tmp_path):
    """pbrt-v4 subset importer (ref plugins/importers/PBRTImporter/)."""
    import numpy as np
    from rtsdm_tpu.scene.importers import import_pbrt
    p = tmp_path / "scene.pbrt"
    p.write_text("""
# test scene
LookAt 0 1 5  0 1 0  0 1 0
WorldBegin
LightSource "distant" "rgb L" [3 3 2.7] "point3 from" [0 5 2] "point3 to" [0 0 0]
Material "diffuse" "rgb reflectance" [0.6 0.2 0.2]
Shape "trianglemesh"
  "point3 P" [ -1 0 0  1 0 0  0 2 0  2 0 0 ]
  "integer indices" [ 0 1 2  1 3 2 ]
  "point2 uv" [ 0 0  1 0  0.5 1  2 0 ]
AttributeBegin
  Translate 0 0 -3
  Material "diffuse" "rgb reflectance" [0.2 0.6 0.2]
  Shape "trianglemesh"
    "point3 P" [ -5 0 0  5 0 0  0 0 -5 ]
    "integer indices" [ 0 1 2 ]
AttributeEnd
""")
    s = import_pbrt(str(p))
    assert s.num_triangles == 3
    pos = np.asarray(s.positions)
    # the translated triangle sits at z = -3..-8
    assert pos[..., 2].min() == -8.0
    assert np.asarray(s.camera.pos_w)[2] == 5.0
    assert int(s.num_lights) == 1 and int(s.light_type[0]) == 1
    # two materials + default
    assert np.asarray(s.mat_base_color).shape[0] == 3


def test_usda_importer(tmp_path):
    """USD text subset importer (ref plugins/importers/USDImporter/)."""
    import numpy as np
    from rtsdm_tpu.scene.importers import import_usda
    p = tmp_path / "scene.usda"
    p.write_text('''#usda 1.0
def Xform "root"
{
    def Mesh "quad"
    {
        point3f[] points = [(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)]
        int[] faceVertexIndices = [0, 1, 2, 3]
        int[] faceVertexCounts = [4]
        color3f[] primvars:displayColor = [(0.1, 0.4, 0.8)]
        double3 xformOp:translate = (0, 2, 0)
    }
    def Mesh "tri"
    {
        point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
        int[] faceVertexIndices = [0, 1, 2]
        int[] faceVertexCounts = [3]
    }
}
''')
    s = import_usda(str(p))
    assert s.num_triangles == 3  # quad fan-triangulates to 2 + 1
    pos = np.asarray(s.positions)
    assert pos[..., 1].max() == 2.0  # translate applied
    cols = np.asarray(s.mat_base_color)
    assert any(np.allclose(c, (0.1, 0.4, 0.8)) for c in cols)


def test_load_any_dispatch_new_formats(tmp_path):
    from rtsdm_tpu.scene.importers import load_any
    import pytest as _pt
    with _pt.raises((ValueError, FileNotFoundError, OSError)):
        load_any(str(tmp_path / "missing.pbrt"))
    with _pt.raises((ValueError, FileNotFoundError, OSError)):
        load_any(str(tmp_path / "missing.usda"))


def test_settings_affect_graph_run(tmp_path):
    """VERDICT r2 #9 done-criterion: a reference-style options file changes
    a graph run (option overrides a pass property through the Renderer)."""
    import json
    import numpy as np
    from rtsdm_tpu.mogwai import Renderer, run_script

    opts = tmp_path / "options.json"
    opts.write_text(json.dumps(
        {"RenderPass": {"HBAO": {"radius": 0.01, "powerExponent": 4.0}}}))

    m = Renderer(width=64, height=64)
    run_script("scripts/HBAO.py", m)
    m.addOptions(str(opts))
    hb = next(p for p in m.active_graph.passes.values()
              if p.pass_type == "HBAO")
    assert float(hb.cfg["radius"]) == 0.01
    m.loadScene("CornellBox")
    out_small = m.renderFrame()

    m2 = Renderer(width=64, height=64)
    run_script("scripts/HBAO.py", m2)
    m2.loadScene("CornellBox")
    out_base = m2.renderFrame()
    key = next(k for k in out_base if k.endswith("out"))
    assert not np.allclose(np.asarray(out_small[key]),
                           np.asarray(out_base[key]))


def test_settings_attribute_filters_on_graph_subject():
    from rtsdm_tpu.mogwai import Renderer, run_script

    m = Renderer(width=64, height=64)
    m.settings.add_filtered_attributes("*:HBAO", {"radius": 0.33})
    run_script("scripts/HBAO.py", m)
    hb = next(p for p in m.active_graph.passes.values()
              if p.pass_type == "HBAO")
    assert abs(float(hb.cfg["radius"]) - 0.33) < 1e-9


def test_pixel_debug():
    """PixelDebug analogue (Utils/Debug/PixelDebug.h:65): selecting a pixel
    surfaces pass intermediates at that pixel after renderFrame; disabling
    removes the taps."""
    import numpy as np
    from rtsdm_tpu.mogwai import Renderer, run_script

    m = Renderer(width=64, height=64)
    run_script("scripts/SVAO_small.py", m)
    m.loadScene("CornellBox")
    m.pixelDebug.select(32, 40)
    m.renderFrame()
    logs = m.pixelDebug.last
    assert any("svao.ao" in k for k in logs), logs.keys()
    assert any("sdrt.stochasticDepth" in k for k in logs)
    for v in logs.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()
    m.pixelDebug.disable()
    m.renderFrame()
    assert m.pixelDebug.last == logs  # no new writes when disabled


def test_emissive_virtual_lights():
    """Emissive geometry becomes shadow-casting analytic point lights when
    the 'Scene:emissiveVirtualLights' option is set (the raster-shading
    analogue of the reference's emissive LightCollection/LightBVH,
    Rendering/Lights/LightBVH.h:57)."""
    import numpy as np
    from rtsdm_tpu.scene.procedural import cornell_box
    from rtsdm_tpu.scene.scene import add_emissive_virtual_lights

    scene = cornell_box()
    n0 = int(scene.num_lights)
    s2 = add_emissive_virtual_lights(scene, max_lights=4)
    assert int(s2.num_lights) > n0
    # the cornell ceiling panel is the emitter: virtual light sits near the
    # ceiling, intensity positive
    new_pos = np.asarray(s2.light_pos)[n0:]
    new_int = np.asarray(s2.light_intensity)[n0:]
    assert (new_int.sum(-1) > 0).all()
    ceil_y = float(np.asarray(scene.positions)[..., 1].max())
    assert (np.abs(new_pos[:, 1] - ceil_y) < 0.2 * ceil_y).all()

    from rtsdm_tpu.mogwai import Renderer, run_script
    m = Renderer(width=48, height=48)
    m.addOptions({"Scene": {"emissiveVirtualLights": 2}})
    run_script("scripts/Forward.py", m)
    m.loadScene("CornellBox")
    assert int(m.scene.num_lights) > n0


def test_plugin_loading(tmp_path):
    """Runtime pass plugins (reference PluginRegistry / FALCOR_PLUGIN_CLASS,
    Core/Plugin.h): a .py plugin registers a pass usable from graph
    scripts."""
    import numpy as np
    from rtsdm_tpu.mogwai import Renderer, load_plugins, run_script
    from rtsdm_tpu.rendergraph.render_pass import PASS_REGISTRY

    plug = tmp_path / "invert_pass.py"
    plug.write_text(
        "from rtsdm_tpu.rendergraph.render_pass import (RenderPass,\n"
        "    PassReflection, register_pass)\n\n"
        "@register_pass('InvertColors')\n"
        "class InvertColors(RenderPass):\n"
        "    SCHEMA = dict()\n"
        "    def reflect(self, ctx):\n"
        "        return (PassReflection().add_input('src')\n"
        "                .add_output('dst'))\n"
        "    def execute(self, ctx, inputs, state=None):\n"
        "        return {'dst': 1.0 - inputs['src']}, None\n")
    new = load_plugins([str(tmp_path)])
    assert new == ["InvertColors"]
    assert "InvertColors" in PASS_REGISTRY

    script = tmp_path / "graph.py"
    script.write_text(
        "from falcor import *\n"
        "g = RenderGraph('P')\n"
        "g.create_pass('GBuf', 'GBufferRaster', {})\n"
        "g.create_pass('Inv', 'InvertColors', {})\n"
        "g.add_edge('GBuf.depth', 'Inv.src')\n"
        "g.mark_output('Inv.dst')\n"
        "m.addGraph(g)\n")
    m = Renderer(width=32, height=32)
    run_script(str(script), m)
    m.loadScene("CornellBox")
    out = m.renderFrame()
    key = next(iter(out))
    assert np.asarray(out[key]).shape[:2] == (32, 32)
    PASS_REGISTRY.pop("InvertColors", None)
