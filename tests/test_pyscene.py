"""Reference PythonImporter object model (scene/pyscene_api.py) — shipped
.pyscene assets execute VERBATIM, SDF grids meshed by marching tetrahedra
(scene/meshing.py). Reference: plugins/importers/PythonImporter/,
Scene/SceneBuilder.h:54, Scene/SDFs/*."""
import os
import textwrap

import numpy as np
import pytest

from rtsdm_tpu.scene.importers import import_pyscene

REF_SDF_DIR = "/root/reference/scripts/sdf-editor"


def test_marching_tetrahedra_sphere():
    from rtsdm_tpu.scene.meshing import marching_tetrahedra
    n = 33
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.sqrt(sum(a ** 2 for a in
                    np.meshgrid(xs, xs, xs, indexing="ij"))) - 0.6
    tris = marching_tetrahedra(g, (-1, -1, -1), (1, 1, 1))
    assert len(tris) > 1000
    r = np.linalg.norm(tris.reshape(-1, 3), axis=-1)
    assert 0.55 < r.min() and r.max() < 0.65      # on the iso-surface
    area = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]),
        axis=-1).sum()
    assert abs(area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.01
    # normals point out of the SDF's inside
    cent = tris.mean(1)
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    assert (np.sum(nrm * cent, -1) > 0).all()


def test_pyscene_reference_object_model(tmp_path):
    """The reference API names (Material/TriangleMesh/Transform/Camera/
    float3) drive our builder through a synthetic .pyscene."""
    src = textwrap.dedent("""
        m = Material('Red')
        m.baseColor = float4(1, 0, 0, 1)
        m.roughness = 0.3
        m.metallic = 1.0
        quad = TriangleMesh.createQuad()
        sceneBuilder.addMeshInstance(
            sceneBuilder.addNode('N', Transform(scaling=float3(2, 1, 2),
                                                translation=float3(0, 1, 0))),
            sceneBuilder.addTriangleMesh(quad, m))
        cube = TriangleMesh.createCube()
        sceneBuilder.addMeshInstance(sceneBuilder.addNode('C'),
                                     sceneBuilder.addTriangleMesh(cube, m))
        cam = Camera()
        cam.position = float3(1, 2, 3)
        cam.focalLength = 35.0
        sceneBuilder.addCamera(cam)
    """)
    p = tmp_path / "t.pyscene"
    p.write_text(src)
    s = import_pyscene(str(p))
    assert s.num_triangles == 2 + 12
    np.testing.assert_allclose(np.asarray(s.mat_base_color[0]), [1, 0, 0])
    assert float(s.mat_metallic[0]) == 1.0
    np.testing.assert_allclose(np.asarray(s.camera.pos_w), [1, 2, 3])
    # quad scaled x2 in XZ and lifted to y=1
    b = np.asarray(s.positions).reshape(-1, 3)
    ys = b[:, 1]
    assert np.isclose(ys.max(), 1.0) or ys.max() <= 1.0 + 0.51


@pytest.mark.skipif(not os.path.isdir(REF_SDF_DIR),
                    reason="reference sdf-editor assets not mounted")
def test_reference_sdf_editor_scene_verbatim():
    """SDFEditorStartScene.pyscene (Material attrs, SDFGrid.createSBS +
    loadPrimitivesFromFile with a relative path, node transforms) builds a
    renderable scene: floor + emissive light + meshed SDF sphere."""
    s = import_pyscene(os.path.join(REF_SDF_DIR,
                                    "SDFEditorStartScene.pyscene"))
    assert s.num_triangles > 100              # sphere got meshed
    emis = np.asarray(s.mat_emissive).sum(-1)
    assert (emis > 0).sum() == 1              # exactly the light material
    b = np.asarray(s.positions).reshape(-1, 3)
    assert b[:, 0].min() <= -4.9 and b[:, 0].max() >= 4.9  # 10x10 floor
    np.testing.assert_allclose(np.asarray(s.camera.pos_w), [0, 0.6, -1.0])


@pytest.mark.skipif(not os.path.isdir(REF_SDF_DIR),
                    reason="reference sdf-editor assets not mounted")
def test_reference_sdf_editor_graph_renders():
    from rtsdm_tpu.mogwai import Renderer, run_script
    m = Renderer(width=48, height=48, use_jit=False)
    run_script(os.path.join(REF_SDF_DIR, "SDFEditor.py"), m)
    m.loadScene(os.path.join(REF_SDF_DIR, "SDFEditorStartScene.pyscene"))
    m.clock.pause()
    out = m.renderFrame()
    img = np.asarray(out["SDFEditor.output"])
    assert img.shape[-1] == 3 and np.isfinite(img).all()
    assert img.max() > 0.01                   # something got lit
