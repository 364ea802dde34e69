"""Bisect svao_phase2_shift (the 33.8 ms headline phase) on TPU.

Times the full phase plus mock-ablated variants (SD-layer affine eval
stubbed, per-(dir,layer) interleave stubbed, fused SD fetch stubbed) to
attribute cost between the Pallas fetch, the 32 quarter->full interleaves,
and the k-layer affine eval. Mocks keep shapes/dtypes so the rest of the
graph is unchanged; numbers are for ATTRIBUTION, not output correctness.

Scan-amortized per CLAUDE.md. One scene build amortizes all variants.
Usage: python tools/phase2_profile.py [--scene SunTemple@full ...]
"""
import argparse
import contextlib
import json
import os
import time
import unittest.mock as mock

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
    a = ap.parse_args()

    from rtsdm_tpu.passes import svao_shift as ph
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO, _normals_to_view
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
                  "stochMapDivisor": 4, "stochMapGuardBand": 512,
                  "exponent": 2.0})
    pass_.set_scene(scene)
    ctx = RenderContext(width=width, height=height, scene=scene,
                        dictionary={"guardBand": 0})
    cfg = pass_._vao_cfg(ctx, (width, height))
    nv = jax.jit(lambda n: _normals_to_view(ctx, n))(packed_n)
    p1 = jax.block_until_ready(jax.jit(lambda d, n: ph.svao_phase1_shift(
        cam, cfg, d, d, n, 0, "SingleDepth", "StochasticDepth"))(lin, nv))
    stencil = p1["stencil"]
    sd_h, sd_w = (pass_._stoch_map_size((width, height))[1],
                  pass_._stoch_map_size((width, height))[0])
    # representative SD map: decreasing pseudo-depth layers
    k = 4
    sd_map = jnp.clip(
        (lin.mean() / (cam.far_z - cam.near_z))
        + 0.05 * (1 + jnp.arange(k, dtype=jnp.float32))[None, None, :]
        * jnp.ones((sd_h, sd_w, 1)), 0.0, 1.0)
    print("p1 done", flush=True)

    def p2(s):
        d = ph.svao_phase2_shift(cam, cfg, lin * s, lin * s, nv, stencil,
                                 sd_map, "SingleDepth")
        return d.sum()

    out = {}
    out["full_ms"] = round(scan_time(p2), 2)
    print("full:", out["full_ms"], flush=True)

    # (b) stub the deinterleaved SD-layer eval (keeps the fused SD fetch —
    # the stub consumes sd_p so the fetch kernel is NOT dead-code-eliminated)
    def stub_eval(cfg_, bq_, sd_p_, lvl_q_, *rest, **kw_):
        return sd_p_[:, 0].astype(jnp.float32) * 0.0 + 1e9

    with mock.patch.object(ph, "_sd_eval_deint", stub_eval):
        out["no_layer_eval_ms"] = round(scan_time(p2), 2)
    print("no_layer_eval:", out["no_layer_eval_ms"], flush=True)

    # (c) + stub the fused Pallas SD fetch too (everything SD-related dead)
    from rtsdm_tpu.ops import fetch_pallas as fp
    nd = cfg.num_directions

    def stub_fetch_sd(sd, guard, rq, levels, offs, radii, pad):
        qh, qw = rq.shape[1], rq.shape[2]
        kp = (sd.shape[-1] + 1) // 2
        return jnp.zeros((nd, 16, kp, qh, qw), jnp.int32)

    def stub_eval_dead(cfg_, bq_, sd_p_, lvl_q_, *rest, **kw_):
        return jnp.full(sd_p_.shape[:1] + sd_p_.shape[2:], 1e9)

    with mock.patch.object(ph, "_sd_eval_deint", stub_eval_dead), \
            mock.patch.object(fp, "fetch_sd_packed", stub_fetch_sd):
        out["no_sd_at_all_ms"] = round(scan_time(p2), 2)
    print("no_sd_at_all:", out["no_sd_at_all_ms"], flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
