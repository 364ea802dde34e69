"""SDF geometry + SDFEditor tests (scene/sdf.py, passes/sdf_editor.py;
reference Scene/SDFs/ + RenderPasses/SDFEditor/)."""
import numpy as np
import jax.numpy as jnp

from rtsdm_tpu.scene.sdf import (OP_SMOOTH_UNION, OP_SUBTRACT, PRIM_BOX,
                                 PRIM_SPHERE, PRIM_TORUS, SDFPrimitiveList,
                                 bake_grid, eval_grid, eval_sdf)


def test_sdf_sphere_box_exact_distance():
    pl = SDFPrimitiveList()
    pl.add(PRIM_SPHERE, (0, 0, 0), (1.0,))
    d = eval_sdf(pl.tables(), jnp.asarray([[3.0, 0, 0], [0, 0.5, 0]]))
    np.testing.assert_allclose(np.asarray(d), [2.0, -0.5], atol=1e-5)

    pl2 = SDFPrimitiveList()
    pl2.add(PRIM_BOX, (0, 0, 0), (1.0, 2.0, 0.5))
    d2 = eval_sdf(pl2.tables(), jnp.asarray([[2.0, 0, 0], [0, 0, 0]]))
    assert abs(float(d2[0]) - 1.0) < 1e-5
    assert float(d2[1]) == -0.5  # inside: nearest face is z


def test_sdf_operators():
    # subtract carves a hole: a point inside the subtracted sphere is outside
    pl = SDFPrimitiveList()
    pl.add(PRIM_BOX, (0, 0, 0), (1, 1, 1))
    pl.add(PRIM_SPHERE, (0, 0, 0), (0.5,), op=OP_SUBTRACT)
    d = eval_sdf(pl.tables(), jnp.asarray([[0.0, 0.0, 0.0], [0.8, 0.8, 0.8]]))
    assert float(d[0]) > 0.0      # center carved out
    assert float(d[1]) < 0.0      # corner still solid
    # smooth union stays within [min - k, min]
    pl3 = SDFPrimitiveList()
    pl3.add(PRIM_SPHERE, (-0.6, 0, 0), (0.5,))
    pl3.add(PRIM_SPHERE, (0.6, 0, 0), (0.5,), op=OP_SMOOTH_UNION,
            smoothing=0.3)
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    ds = float(eval_sdf(pl3.tables(), p)[0])
    dmin = min(abs(-0.6) - 0.5, abs(0.6) - 0.5)
    assert ds <= dmin + 1e-6 and ds >= dmin - 0.31


def test_sdf_grid_matches_analytic():
    pl = SDFPrimitiveList()
    pl.add(PRIM_SPHERE, (0.2, -0.1, 0.3), (0.8,))
    pl.add(PRIM_TORUS, (0, 0.5, 0), (0.6, 0.2))
    t = pl.tables()
    grid, bounds = bake_grid(t, (-2, -2, -2), (2, 2, 2), n=96)
    rng = np.random.default_rng(5)
    p = jnp.asarray(rng.uniform(-1.5, 1.5, (64, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(eval_grid(grid, bounds, p)),
                               np.asarray(eval_sdf(t, p)), atol=0.05)


def test_sdf_editor_roundtrip_and_render():
    from rtsdm_tpu.passes.sdf_editor import SDFEditor
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box

    p = SDFEditor({"iterations": 48})
    pid = p.addPrimitive(PRIM_SPHERE, (1.0, 1.0, 0.0), (1.0,))  # on the view axis
    p.addPrimitive(PRIM_SPHERE, (1.0, 2.2, 0.0), (0.4,))
    # serialization roundtrip (ref .sdfg save/load)
    d = p.primitives.to_dict()
    back = SDFPrimitiveList.from_dict(d)
    assert len(back) == 2 and back.to_dict() == d

    scene = cornell_box()  # camera at (1,1,4.4) looking at (1,1,0)
    p.set_scene(scene)
    ctx = RenderContext(width=64, height=64, scene=scene, dictionary={})
    out, _ = p.execute(ctx, {})
    hit = np.asarray(out["linearZ"]) < scene.camera.far_z * 0.99
    assert hit.mean() > 0.05                      # the sphere is visible
    center_z = float(np.asarray(out["linearZ"])[32, 32])
    # camera 4.4 units away, unit sphere -> first hit ~3.4 units (view z)
    assert 2.5 < center_z < 4.0
    n = np.asarray(out["normalW"])[32, 32]
    assert n @ n > 0.5                            # valid normal at center
    # editor edit invalidates + moves the surface
    p.movePrimitive(pid, (10.0, 0.0, 0.0))
    out2, _ = p.execute(ctx, {})
    assert float(np.asarray(out2["linearZ"])[32, 32]) > center_z


def test_sdf_editor_grid_backed_matches_analytic():
    from rtsdm_tpu.passes.sdf_editor import SDFEditor
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    ctx = RenderContext(width=48, height=48, scene=scene, dictionary={})
    outs = []
    for grid_backed in (False, True):
        p = SDFEditor({"iterations": 48, "gridBacked": grid_backed,
                       "gridRes": 96})
        p.addPrimitive(PRIM_SPHERE, (1.0, 1.0, 0.0), (1.0,))
        p.set_scene(scene)
        out, _ = p.execute(ctx, {})
        outs.append(np.asarray(out["linearZ"]))
    hit = (outs[0] < scene.camera.far_z * 0.99) \
        & (outs[1] < scene.camera.far_z * 0.99)
    assert hit.mean() > 0.05
    np.testing.assert_allclose(outs[0][hit], outs[1][hit], atol=0.1)
