"""Trace-smoke for the five BASELINE staged configs (VERDICT r2 item 1).

Each config's full graph is traced with `jax.eval_shape` at its REAL
resolution and divisor arithmetic (trace-time shape bugs like the r2
config-4 `(76,512) vs (75,512)` ceil-division mismatch are caught here,
on CPU, before any TPU run). Small-tier scenes keep load fast — triangle
count does not affect traced shapes. The TPU-only code paths (Pallas SD
trace, Pallas shadow rays) are forced on via a fake device list so the
branches the real benchmark compiles are the branches traced here.
"""
import types

import jax
import pytest

from rtsdm_tpu.mogwai import Renderer, run_script

# mirror of bench_configs.CONFIGS with small-tier scenes
CONFIGS = [
    dict(name="1_hbao_cornell_256", script="scripts/HBAO.py",
         scene="CornellBox", width=256, height=256),
    dict(name="2_svao_raster_sd_arcade_720p", script="scripts/SVAO_small.py",
         scene="Arcade", width=1280, height=720,
         overrides={"SVAO": {"stochasticDepthImpl": "Raster"}}),
    dict(name="3_ray_sd_suntemple_1080p", script="scripts/SVAO_small.py",
         scene="SunTemple", width=1920, height=1080,
         overrides={"SVAO": {"stochMapDivisor": 1, "stochMapGuardBand": 512}}),
    dict(name="4_quarter_ray_sd_bistro_1080p", script="scripts/SVAO_quarter.py",
         scene="Bistro", width=1920, height=1080),
    dict(name="5_shaded_taa_flythrough_emerald", script="scripts/SVAO_small.py",
         scene="EmeraldSquare", width=1280, height=720, animate=True),
]


@pytest.fixture
def fake_tpu_devices(monkeypatch):
    """Force platform-gated Pallas branches on (trace only, never executed)."""
    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: [types.SimpleNamespace(platform="tpu")])


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_config_traces(cfg, fake_tpu_devices):
    m = Renderer(width=cfg["width"], height=cfg["height"])
    run_script(cfg["script"], m)
    for pname, props in cfg.get("overrides", {}).items():
        m.active_graph.get_pass(pname).cfg.update(props)
    m.loadScene(cfg["scene"])
    if cfg.get("animate"):
        import numpy as np
        import jax.numpy as jnp
        from rtsdm_tpu.scene.animation import (AnimationController,
                                               CameraPath, NodeTrack)
        from rtsdm_tpu.utils.structs import replace
        m.cameraPath = CameraPath.orbit(center=(0, 2, 0), radius=45.0,
                                        height=14.0, duration=8.0)
        cent = np.asarray(m.scene.positions).mean(1)
        sel = np.argsort(cent[:, 1])[-max(len(cent) // 50, 1):]
        node = np.zeros(len(cent), np.int32)
        node[sel] = 1
        m.scene = replace(m.scene, node_id=jnp.asarray(node))
        for gr in m.graphs:
            gr.set_scene(m.scene)
        m.animationController = AnimationController(
            {1: NodeTrack.oscillate((0.0, 1.0, 0.0), amplitude=0.5,
                                    period=4.0)})
        m.clock.play()
    else:
        m.clock.pause()
    m._build_frame_fn()
    scene = m._scene_comp
    if m.animationController is not None:
        scene = m.animationController.animate(scene, 0.05)
    if m.cameraPath is not None:
        base = m._scene_comp.camera
        cam = m.cameraPath.camera_at(0.05, base, aspect=float(base.aspect),
                                     focal=float(base.focal_length))
        scene = scene.with_camera(cam)
    out, _ = jax.eval_shape(
        lambda s, st: m._frame_fn(s, st, frame_index=1, time=0.05),
        scene, m._state)
    assert out, f"{cfg['name']}: no outputs"
    for k, v in out.items():
        assert v.shape[0] > 0 and v.shape[1] > 0, (k, v.shape)
