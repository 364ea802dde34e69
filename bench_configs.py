"""Per-config benchmark: runs each BASELINE.json staged config at its real
resolution on the TPU and reports whole-frame steady-state ms. Writes
BENCH_CONFIGS.json (informational; the driver's headline metric is bench.py).
"""
import functools
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


def run_config(c, frames=8):
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
    m.renderFrame()  # builds _frame_fn/_state and compiles the single-frame path
    compile_s = time.perf_counter() - t0

    # Steady-state: K frames inside ONE jit (lax.scan), state threaded,
    # frame_index/time vary per step (jitter + temporal passes see fresh
    # inputs -> the axon memoization stays honest), one scalar readback at
    # the end. A per-frame renderFrame() loop measures the ~30-70 ms axon
    # tunnel dispatch+sync per call, not the frame (CLAUDE.md rules; the r2
    # committed numbers had exactly that flaw). For the animated config the
    # camera path is baked into a stacked camera pytree indexed per step.
    import jax.tree_util as jtu

    graph = m.active_graph
    rw, rh, gb = m._render_res()
    fn = graph.frame_fn(rw, rh, dictionary={"guardBand": gb})
    state0 = m._state
    scene = m._scene_comp
    dt = 1.0 / m.clock.framerate

    cams = None
    if c.get("animate"):
        base = scene.camera
        cam_list = [m.cameraPath.camera_at(i * dt, base, dt=dt,
                                           aspect=float(base.aspect),
                                           focal=float(base.focal_length))
                    for i in range(frames)]
        cams = jtu.tree_map(lambda *xs: jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in xs]), *cam_list)

    def step(st, i):
        sc = scene
        if cams is not None:
            sc = scene.with_camera(jtu.tree_map(lambda a: a[i % frames], cams))
        marked, st2 = fn(sc, st, frame_index=i,
                         time=i.astype(jnp.float32) * dt)
        acc = sum(jnp.sum(v).astype(jnp.float32) for v in marked.values()
                  if hasattr(v, "dtype"))
        return st2, acc

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k_frames(st, i0):
        st, accs = jax.lax.scan(step, st, i0 + jnp.arange(frames))
        return st, accs.sum()

    t0 = time.perf_counter()
    stw, acc = k_frames(state0, jnp.int32(1))
    jax.block_until_ready(acc)
    compile_s += time.perf_counter() - t0

    runs = []
    st = stw
    for r in range(3):
        t0 = time.perf_counter()
        st, acc = k_frames(st, jnp.int32(1 + frames * (r + 1)))
        acc_f = float(acc)
        runs.append((time.perf_counter() - t0) / frames * 1e3)
    runs.sort()
    return dict(name=c["name"], frame_ms=round(runs[len(runs) // 2], 2),
                frame_ms_runs=[round(x, 2) for x in runs],
                compile_s=round(compile_s, 1), triangles=tris,
                readback=round(acc_f, 2),
                resolution=f"{c['width']}x{c['height']}", scene=c["scene"])


def main():
    # One config per PROCESS by default: the axon client panics ("index out
    # of bounds" client.rs:2008, rc=134) when a second large graph compiles
    # in the same process — observed twice at the config 1 -> 2 transition
    # (2026-08-19). --config N runs a single config and writes a part file;
    # with no argument, orchestrate subprocesses and merge.
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0,
                    help="1-based config index; run in THIS process and "
                         "write BENCH_CONFIGS.partN.json")
    a = ap.parse_args()
    if a.config:
        c = CONFIGS[a.config - 1]
        try:
            r = run_config(c)
        except Exception as e:  # keep the report going
            import traceback
            traceback.print_exc(file=sys.stderr)
            r = dict(name=c["name"], error=str(e)[:300])
        print(json.dumps(r), flush=True)
        with open(f"BENCH_CONFIGS.part{a.config}.json", "w") as f:
            json.dump(r, f)
        return 0

    results = []
    for i in range(1, len(CONFIGS) + 1):
        p = subprocess.run([sys.executable, __file__, "--config", str(i)],
                           timeout=3600)
        part = f"BENCH_CONFIGS.part{i}.json"
        try:
            with open(part) as f:
                results.append(json.load(f))
            os.unlink(part)
        except FileNotFoundError:
            results.append(dict(name=CONFIGS[i - 1]["name"],
                                error=f"subprocess rc={p.returncode}, "
                                      "no part file (worker crash?)"))
        print(json.dumps(results[-1]), flush=True)
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
