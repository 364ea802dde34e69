"""Sub-step profile of the ray-SD trace (the dominant headline phase).

Splits the SD pass cost into: ray setup (XLA), chunk-list build (the XLA
'TLAS walk' + top_k compaction), the Pallas streaming kernel, and decode.
All timings scan-amortized inside one jit (CLAUDE.md measurement rules).

Usage: python tools/sd_profile.py [--scene SunTemple@full --width 1920 --height 1080]
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp

K = 8


def scan_time(step, n_runs=3):
    def body(carry, i):
        s = 1.0 + 1e-6 * i.astype(jnp.float32)
        return carry + step(s), None

    @jax.jit
    def fn(i0):
        acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
        return acc

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
    ap.add_argument("--divisor", type=int, default=4)
    ap.add_argument("--guard", type=int, default=512)
    ap.add_argument("--save-inputs", default=None,
                    help="npz path: dump the captured kernel inputs for "
                         "fast kernel-only A/B (tools/sd_kernel_ab.py) "
                         "without re-paying the scene build")
    a = ap.parse_args()

    from rtsdm_tpu.ops import rt_pallas as rp
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO, _normals_to_view
    from rtsdm_tpu.passes.svao_shift import svao_phase1_shift
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import load_scene
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)

    width, height = a.width, a.height
    print("building scene...", flush=True)
    scene = load_scene(a.scene, aspect=width / height)
    cam = scene.camera
    g = raster_gbuffer(scene, width, height, max_per_tile=512)
    lin = cam.linearize_depth(g["depth"])
    packed_n = encode_normal_2x16(
        normalize(transform_vector(cam.view_mat, g["faceNormalW"])))
    pass_ = SVAO({"secondaryDepthMode": "StochasticDepth",
                  "stochasticDepthImpl": "Ray", "radius": 0.2,
                  "stochMapDivisor": a.divisor,
                  "stochMapGuardBand": a.guard, "exponent": 2.0})
    pass_.set_scene(scene)
    ctx = RenderContext(width=width, height=height, scene=scene,
                        dictionary={"guardBand": 0})
    cfg = pass_._vao_cfg(ctx, (width, height))
    nv = jax.jit(lambda n: _normals_to_view(ctx, n))(packed_n)
    p1 = jax.block_until_ready(jax.jit(lambda d, n: svao_phase1_shift(
        cam, cfg, d, d, n, 0, "SingleDepth", "StochasticDepth"))(lin, nv))
    ray_min, ray_max = p1["ray_min"], p1["ray_max"]
    print("p1 done", flush=True)

    # capture kernel args by hooking the stream entry
    captured = {}
    orig = rp.sd_trace_pallas_stream

    def hook(*args, **kw):
        captured["args"] = args
        captured["kw"] = dict(kw)
        return orig(*args, **kw)

    rp.sd_trace_pallas_stream = hook
    sd_graph = pass_._build_sd_graph()
    sd_graph.set_scene(scene)
    sd_w, sd_h = pass_._stoch_map_size((width, height))
    sd_ctx = RenderContext(width=sd_w, height=sd_h, scene=scene,
                           dictionary={"guardBand": 0})

    def run_sd(lz, dm, rmin, rmax):
        marked, _, _ = sd_graph.execute(
            sd_ctx, {},
            external_inputs={"StochasticDepthMap.linearZ": lz,
                             "StochasticDepthMap.depthMap": dm,
                             "StochasticDepthMap.rayMin": rmin,
                             "StochasticDepthMap.rayMax": rmax})
        return marked["StochasticDepthMap.stochasticDepth"]

    # capture must run EAGERLY: hooking inside a jit trace captures tracers,
    # which leak out of the transform (UnexpectedTracerError)
    jax.block_until_ready(run_sd(lin, g["depth"], ray_min, ray_max))
    rp.sd_trace_pallas_stream = orig
    (tri_packed, aabb, origins, dirs, tmin, tmax, vz, near, far) = \
        captured["args"]
    kw = captured["kw"]
    tri_packed, aabb, origins, dirs, tmin, tmax, vz = jax.block_until_ready(
        (tri_packed, aabb, origins, dirs, tmin, tmax, vz))
    out = {"chunks": int(tri_packed.shape[0]), "rays": int(dirs.shape[0])}

    if a.save_inputs:
        import numpy as _np
        extra = {}
        scalars = {}
        for m, v in kw.items():
            if callable(v):
                continue
            if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
                extra["kwarr_" + m] = _np.asarray(v)   # e.g. rx/ry
            else:
                scalars[m] = v
        _np.savez_compressed(
            a.save_inputs, tri_packed=_np.asarray(tri_packed),
            aabb=_np.asarray(aabb), origins=_np.asarray(origins),
            dirs=_np.asarray(dirs), tmin=_np.asarray(tmin),
            tmax=_np.asarray(tmax), vz=_np.asarray(vz),
            near=float(near), far=float(far),
            kw=_np.asarray(json.dumps(scalars)), **extra)
        print(f"saved kernel inputs -> {a.save_inputs}", flush=True)

    # average live chunk-list length (diagnostic)
    lists, counts = jax.jit(rp.build_chunk_lists)(aabb, origins, dirs,
                                                  tmin, tmax)
    import numpy as np
    cn = np.asarray(counts)
    out["blocks"] = int(cn.shape[0])
    out["mean_chunks_per_block"] = round(float(cn.mean()), 1)
    out["p95_chunks_per_block"] = round(float(np.percentile(cn, 95)), 1)
    out["capped_blocks_pct"] = round(
        100.0 * float((cn > rp.LIST_CAP).mean()), 2)

    out["full_sd_pass_ms"] = round(scan_time(
        lambda s: run_sd(lin * s, g["depth"] * s, ray_min * s,
                         ray_max * s).sum()), 2)
    out["kernel_only_ms"] = round(scan_time(
        lambda s: orig(tri_packed, aabb, origins, dirs, tmin * s, tmax * s,
                       vz, near, far, **kw).sum()), 2)
    out["chunk_lists_ms"] = round(scan_time(
        lambda s: sum(x.sum().astype(jnp.float32) for x in
                      rp.build_chunk_lists(aabb, origins, dirs, tmin * s,
                                           tmax * s))), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
