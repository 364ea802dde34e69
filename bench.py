"""Headline benchmark: SVAO Ray-SD AO time at 1920x1080 on one TPU chip.

Measures the AO portion of the frame (SVAO phase 1 + ray-traced stochastic
depth map + phase 2 resolve — the passes the north star bounds at 10 ms,
BASELINE.json) on the Sun Temple stand-in scene, steady state.

Measurement hygiene (CLAUDE.md: the axon runtime memoizes identical
executions, so repeated identical inputs measure cache hits):
  * every call — warmup included — feeds a NEVER-REPEATED input (depth
    perturbed by a global call index; values differ, shapes/graph identical),
  * every iteration forces a host readback (float(out.sum())),
  * a trivial-kernel floor (same readback scheme on a same-size array) is
    measured and subtracted,
  * the whole measurement runs 3 times; the median is reported with the
    spread in "runs_ms".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline = value / 10.0 (the 10 ms/frame north-star budget; < 1.0 beats it).
Extra keys: "breakdown" (phase1/sd_trace/phase2 ms, measured separately with
the same hygiene), "triangles", "runs_ms", "floor_ms".
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp

N_ITERS = 8
N_RUNS = 3


def _time_fn(fn, make_variant, iters=N_ITERS):
    """Steady-state ms/call with a host readback per call.

    make_variant(j) -> input tuple for global index j. EVERY call — warmup
    included — gets a distinct input: the axon runtime memoizes identical
    executions (CLAUDE.md), so re-timing an input that has executed before
    (even once, in warmup or a previous run) can measure a cache hit.
    Returns the median over N_RUNS runs plus all runs."""
    for j in (-1, -2):  # warmup (compile + first-touch), never re-timed
        out = fn(*make_variant(j))
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
            out)
    runs = []
    g = 0
    for _ in range(N_RUNS):
        vs = [make_variant(g + i) for i in range(iters)]  # fresh per run
        jax.block_until_ready(vs)
        acc = 0.0
        t0 = time.perf_counter()
        for v in vs:
            out = fn(*v)
            first = jax.tree_util.tree_leaves(out)[0]
            acc += float(first.sum())  # host readback per call
        runs.append((time.perf_counter() - t0) / iters * 1e3)
        g += iters
    runs.sort()
    return runs[len(runs) // 2], runs


def _probe_device(timeout_s=240):
    """Fail fast (with a diagnostic JSON line) when the axon tunnel is
    WEDGED — a wedged tunnel hangs every device op including jax.devices()
    (CLAUDE.md), which would otherwise hang the whole bench run silently."""
    import subprocess
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": "svao_ray_sd_ao_ms_per_frame_1080p",
            "value": None, "unit": "ms", "vs_baseline": None,
            "error": f"device probe failed ({type(e).__name__}): "
                     "axon tunnel wedged or unavailable"}))
        return False


def main():
    if not _probe_device():
        return 1
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO, _normals_to_view
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import sun_temple
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)

    width, height = 1920, 1080
    # reference-scale tier (323k tris, alpha-masked foliage) — the headline
    # must exercise real triangle counts (VERDICT r1 missing #2)
    scene = sun_temple(aspect=width / height, detail="full")
    cam = scene.camera

    g = raster_gbuffer(scene, width, height, max_per_tile=512)
    lin = cam.linearize_depth(g["depth"])
    packed = encode_normal_2x16(
        normalize(transform_vector(cam.view_mat, g["faceNormalW"])))
    jax.block_until_ready((g["depth"], lin, packed))

    pass_ = SVAO({"secondaryDepthMode": "StochasticDepth",
                  "stochasticDepthImpl": "Ray", "radius": 0.2,
                  "stochMapDivisor": 4, "stochMapGuardBand": 512,
                  "exponent": 2.0})
    pass_.set_scene(scene)
    ctx = RenderContext(width=width, height=height, scene=scene,
                        dictionary={"guardBand": 0})

    def ao_step(scene, gdepth, lin, normals):
        out, _ = pass_.execute(ctx, {"gbufferDepth": gdepth, "depth": lin,
                                     "depth2": lin, "normals": normals,
                                     "color": None})
        return out["ao"]

    fn = jax.jit(ao_step)

    # input variants: tiny multiplicative depth perturbations — same graph,
    # a NEVER-REPEATED value for every call (j spans warmup + all runs)
    def make_variant(j):
        s = 1.0 + 1e-6 * j
        return (scene, g["depth"] * s, lin * s, packed)

    # trivial-kernel floor: dispatch + readback overhead on a same-size array
    floor_fn = jax.jit(lambda a: a * 1.0000001 + 1.0)
    floor_ms, _ = _time_fn(floor_fn, lambda j: (lin * (1.0 + 1e-6 * j),))

    total_ms_raw, runs = _time_fn(fn, make_variant)
    total_percall_ms = max(total_ms_raw - floor_ms, 0.0)

    # steady-state frame time: K frames inside ONE jit (lax.scan), inputs
    # perturbed per step (hygiene preserved — every step sees fresh values),
    # one readback at the end. This is what a production frame loop achieves:
    # back-to-back device execution without a ~30 ms host round trip per
    # frame through the axon tunnel (the per-call number keeps that
    # overhead; both are reported).
    K = 8

    def frame_body(carry, i):
        s = 1.0 + 1e-6 * i.astype(jnp.float32)
        ao = ao_step(scene, g["depth"] * s, lin * s, packed)
        return carry + ao.sum(), None

    @jax.jit
    def frames(i0):
        acc, _ = jax.lax.scan(frame_body, 0.0, i0 + jnp.arange(K))
        return acc

    jax.block_until_ready(frames(jnp.int32(0)))
    scan_runs = []
    for r in range(N_RUNS):
        t0 = time.perf_counter()
        jax.block_until_ready(frames(jnp.int32(100 * (r + 1))))
        scan_runs.append((time.perf_counter() - t0) * 1e3 / K)
    scan_runs.sort()
    total_ms = scan_runs[len(scan_runs) // 2]

    # ---- per-phase breakdown (same hygiene, phases jitted separately) ----
    from rtsdm_tpu.passes.svao_shift import (svao_phase1_shift,
                                             svao_phase2_shift)
    cfg = pass_._vao_cfg(ctx, (width, height))
    normal_v_fn = jax.jit(lambda nrm: _normals_to_view(ctx, nrm))
    nv = jax.block_until_ready(normal_v_fn(packed))

    # phases are scan-amortized like the headline (r2's per-call phase
    # numbers were ~2x-wrong both ways: the 8-variant/16-iter cycle made
    # half the calls axon-memoized cache hits, and sub-100 ms per-call
    # timings measure the noisy tunnel — CLAUDE.md measurement rules)
    def _scan_phase(step):
        def body(carry, i):
            s = 1.0 + 1e-6 * i.astype(jnp.float32)
            return carry + step(s), None

        @jax.jit
        def fr(i0):
            acc, _ = jax.lax.scan(body, 0.0, i0 + jnp.arange(K))
            return acc

        jax.block_until_ready(fr(jnp.int32(0)))
        rs = []
        for r in range(N_RUNS):
            t0 = time.perf_counter()
            jax.block_until_ready(fr(jnp.int32(100 * (r + 1))))
            rs.append((time.perf_counter() - t0) * 1e3 / K)
        rs.sort()
        return rs[len(rs) // 2]

    p1_fn = jax.jit(lambda d, n: svao_phase1_shift(
        cam, cfg, d, d, n, 0, "SingleDepth", "StochasticDepth"))

    def p1_step(s):
        r = svao_phase1_shift(cam, cfg, lin * s, lin * s, nv, 0,
                              "SingleDepth", "StochasticDepth")
        return (r["ao_raw"].sum() + r["ray_min"].sum() + r["ray_max"].sum()
                + r["stencil"].astype(jnp.float32).sum())

    p1_ms = _scan_phase(p1_step)
    p1_out = jax.block_until_ready(p1_fn(lin, nv))
    sd_graph = pass_._build_sd_graph()
    sd_graph.set_scene(scene)
    sd_w, sd_h = pass_._stoch_map_size((width, height))
    sd_ctx = RenderContext(width=sd_w, height=sd_h, scene=scene,
                           dictionary={"guardBand": 0})

    def sd_step(scene_, lin_, gdepth_, rmin, rmax):
        sd_ctx.scene = scene_
        marked, _, _ = sd_graph.execute(
            sd_ctx, {},
            external_inputs={"StochasticDepthMap.linearZ": lin_,
                             "StochasticDepthMap.depthMap": gdepth_,
                             "StochasticDepthMap.rayMin": rmin,
                             "StochasticDepthMap.rayMax": rmax})
        return marked["StochasticDepthMap.stochasticDepth"]

    sd_fn = jax.jit(sd_step)

    def sd_scan_step(s):
        return sd_step(scene, lin * s, g["depth"] * s,
                       p1_out["ray_min"] * s, p1_out["ray_max"] * s).sum()

    sd_ms = _scan_phase(sd_scan_step)

    sd_map = jax.block_until_ready(
        sd_fn(scene, lin, g["depth"], p1_out["ray_min"], p1_out["ray_max"]))

    def p2_step(s):
        return svao_phase2_shift(cam, cfg, lin * s, lin * s, nv,
                                 p1_out["stencil"], sd_map * s,
                                 "SingleDepth", divisor=4).sum()

    p2_ms = _scan_phase(p2_step)

    breakdown = {
        "phase1_ms": round(p1_ms, 3),
        "sd_trace_ms": round(sd_ms, 3),
        "phase2_ms": round(p2_ms, 3),
    }

    print(json.dumps({
        "metric": "svao_ray_sd_ao_ms_per_frame_1080p",
        "value": round(total_ms, 3),
        "unit": "ms",
        "vs_baseline": round(total_ms / 10.0, 4),
        "triangles": int(scene.num_triangles),
        "measure": "steady-state: 8 frames per jit (scan), inputs varied "
                   "per frame, 3-run median",
        "per_call_ms": round(total_percall_ms, 3),
        "floor_ms": round(floor_ms, 3),
        "runs_ms": [round(r, 3) for r in scan_runs],
        "per_call_runs_ms": [round(r, 3) for r in runs],
        "breakdown": breakdown,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
