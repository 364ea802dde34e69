"""Scan-amortized per-phase profile of the headline SVAO pipeline on TPU.

Per CLAUDE.md measurement rules: every phase is timed as K perturbed
iterations inside ONE jit (lax.scan), one readback at the end — per-call
timings of sub-100 ms kernels measure the axon tunnel, not the kernel.

Usage: python tools/phase_profile.py [--width 1920 --height 1080 --scene SunTemple@full]
Prints one JSON line with per-phase ms.
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp

K = 8


def scan_time(build_body, n_runs=3):
    """build_body: () -> (jitted fn taking i0, producing scalar). Times K
    iterations inside one jit; returns median ms/iter over n_runs."""
    fn = build_body()
    jax.block_until_ready(fn(jnp.int32(0)))
    runs = []
    for r in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jnp.int32(100 * (r + 1))))
        runs.append((time.perf_counter() - t0) * 1e3 / K)
    runs.sort()
    return runs[len(runs) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="SunTemple@full")
    a = ap.parse_args()

    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO, _normals_to_view
    from rtsdm_tpu.passes.svao_shift import (svao_phase1_shift,
                                             svao_phase2_shift)
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import load_scene
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)

    width, height = a.width, a.height
    scene = load_scene(a.scene, aspect=width / height)
    cam = scene.camera
    g = raster_gbuffer(scene, width, height, max_per_tile=512)
    lin = cam.linearize_depth(g["depth"])
    packed = encode_normal_2x16(
        normalize(transform_vector(cam.view_mat, g["faceNormalW"])))

    pass_ = SVAO({"secondaryDepthMode": "StochasticDepth",
                  "stochasticDepthImpl": "Ray", "radius": 0.2,
                  "stochMapDivisor": 4, "stochMapGuardBand": 512,
                  "exponent": 2.0})
    pass_.set_scene(scene)
    ctx = RenderContext(width=width, height=height, scene=scene,
                        dictionary={"guardBand": 0})
    cfg = pass_._vao_cfg(ctx, (width, height))
    nv = jax.block_until_ready(jax.jit(
        lambda n: _normals_to_view(ctx, n))(packed))
    lin = jax.block_until_ready(lin)

    out = {}

    # phase 1
    def build_p1():
        def body(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            r = svao_phase1_shift(cam, cfg, lin * s, lin * s, nv, 0,
                                  "SingleDepth", "StochasticDepth")
            return (carry + r["ao_raw"].sum() + r["ray_min"].sum()
                    + r["ray_max"].sum()
                    + r["stencil"].astype(jnp.float32).sum()), None

        @jax.jit
        def fn(i0):
            acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
            return acc
        return fn

    out["phase1_ms"] = scan_time(build_p1)

    p1 = jax.block_until_ready(jax.jit(lambda d, n: svao_phase1_shift(
        cam, cfg, d, d, n, 0, "SingleDepth", "StochasticDepth"))(lin, nv))

    # SD trace (nested graph: ray setup + pallas trace + normalize)
    sd_graph = pass_._build_sd_graph()
    sd_graph.set_scene(scene)
    sd_w, sd_h = pass_._stoch_map_size((width, height))
    sd_ctx = RenderContext(width=sd_w, height=sd_h, scene=scene,
                           dictionary={"guardBand": 0})

    def build_sd():
        def body(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            marked, _, _ = sd_graph.execute(
                sd_ctx, {},
                external_inputs={"StochasticDepthMap.linearZ": lin * s,
                                 "StochasticDepthMap.depthMap": g["depth"] * s,
                                 "StochasticDepthMap.rayMin": p1["ray_min"] * s,
                                 "StochasticDepthMap.rayMax": p1["ray_max"] * s})
            return carry + marked["StochasticDepthMap.stochasticDepth"].sum(), None

        @jax.jit
        def fn(i0):
            acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
            return acc
        return fn

    out["sd_trace_ms"] = scan_time(build_sd)

    sd_map = jax.block_until_ready(jax.jit(
        lambda lz, dm, rmin, rmax: sd_graph.execute(
            sd_ctx, {}, external_inputs={
                "StochasticDepthMap.linearZ": lz,
                "StochasticDepthMap.depthMap": dm,
                "StochasticDepthMap.rayMin": rmin,
                "StochasticDepthMap.rayMax": rmax})[0]
        ["StochasticDepthMap.stochasticDepth"])(
            lin, g["depth"], p1["ray_min"], p1["ray_max"]))

    # phase 2
    def build_p2():
        def body(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            d = svao_phase2_shift(cam, cfg, lin * s, lin * s, nv,
                                  p1["stencil"], sd_map * s, "SingleDepth",
                                  divisor=4)
            return carry + d.sum(), None

        @jax.jit
        def fn(i0):
            acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
            return acc
        return fn

    out["phase2_ms"] = scan_time(build_p2)

    # whole AO step
    def build_all():
        def body(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            o, _ = pass_.execute(ctx, {"gbufferDepth": g["depth"] * s,
                                       "depth": lin * s, "depth2": lin * s,
                                       "normals": packed, "color": None})
            return carry + o["ao"].sum(), None

        @jax.jit
        def fn(i0):
            acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
            return acc
        return fn

    out["total_ms"] = scan_time(build_all)
    out["triangles"] = int(scene.num_triangles)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
