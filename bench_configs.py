"""Per-config benchmark: runs each BASELINE.json staged config at its real
resolution on the TPU and reports whole-frame steady-state ms. Writes
BENCH_CONFIGS.json (informational; the driver's headline metric is bench.py).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax


CONFIGS = [
    dict(name="1_hbao_cornell_256", script="scripts/HBAO.py",
         scene="CornellBox", width=256, height=256,
         outputs=["Ambient.out"]),
    dict(name="2_svao_raster_sd_arcade_720p", script="scripts/SVAO_small.py",
         scene="Arcade@full", width=1280, height=720,
         overrides={"SVAO": {"stochasticDepthImpl": "Raster"}},
         outputs=["AmbientOcclusion.out"]),
    dict(name="3_ray_sd_suntemple_1080p", script="scripts/SVAO_small.py",
         scene="SunTemple@full", width=1920, height=1080,
         overrides={"SVAO": {"stochMapDivisor": 1, "stochMapGuardBand": 512}},
         outputs=["AmbientOcclusion.out"]),
    dict(name="4_quarter_ray_sd_bistro_1080p", script="scripts/SVAO_quarter.py",
         scene="Bistro@full", width=1920, height=1080,
         outputs=["AmbientOcclusion.out"]),
    dict(name="5_shaded_taa_flythrough_emerald", script="scripts/SVAO_small.py",
         scene="EmeraldSquare@full", width=1280, height=720, animate=True,
         outputs=["ShadedTAA.colorOut"]),
]


def run_config(c, frames=5):
    import jax.numpy as jnp
    import numpy as np

    from rtsdm_tpu.mogwai import Renderer, run_script
    from rtsdm_tpu.scene.animation import (AnimationController, CameraPath,
                                           NodeTrack)
    from rtsdm_tpu.utils.structs import replace

    m = Renderer(width=c["width"], height=c["height"])
    run_script(c["script"], m)
    for pname, props in c.get("overrides", {}).items():
        m.active_graph.get_pass(pname).cfg.update(props)
    m.loadScene(c["scene"])
    if c.get("animate"):
        m.cameraPath = CameraPath.orbit(center=(0, 2, 0), radius=45.0,
                                        height=14.0, duration=8.0)
        # "animated flythrough" moves GEOMETRY too: the tallest scene
        # chunk oscillates (AnimationController, VERDICT r1 next #10)
        cent = np.asarray(m.scene.positions).mean(1)
        sel = np.argsort(cent[:, 1])[-len(cent) // 50:]  # top 2% by height
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
    tris = int(m.scene.num_triangles)
    t0 = time.perf_counter()
    m.renderFrame()  # compile
    compile_s = time.perf_counter() - t0
    # steady-state: frames back-to-back, inputs varied per frame (the clock
    # advances -> traced frame_index/jitter change, defeating the axon
    # memoization), ONE readback at the end. Per-frame host readbacks add a
    # noisy ~30-60 ms tunnel stall each and measure the tunnel, not the
    # frame (CLAUDE.md measurement rules).
    t0 = time.perf_counter()
    out = None
    for f in range(frames):
        if not c.get("animate"):
            m.clock.frame = f + 1
        out = m.renderFrame()
    acc = float(next(iter(out.values())).sum())
    ms = (time.perf_counter() - t0) / frames * 1e3
    return dict(name=c["name"], frame_ms=round(ms, 2),
                compile_s=round(compile_s, 1), triangles=tris,
                readback=round(acc, 2),
                resolution=f"{c['width']}x{c['height']}", scene=c["scene"])


def main():
    results = []
    for c in CONFIGS:
        try:
            r = run_config(c)
        except Exception as e:  # keep the report going
            r = dict(name=c["name"], error=str(e)[:300])
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
