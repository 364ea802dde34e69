"""Stencil-density statistics for the SVAO phase-2 sparsity decision.

The reference refines only stencil-masked samples (SVAORaster2.ps.slang:
56-58, stencil test); the repo's shift-mode phase 2 is dense masked math.
Whether a TPU tile-skip / compaction variant can win depends on (a) the
per-direction bit density and (b) how spatially coherent the bits are at
TPU tile granularity — this tool measures both on a real scene so the
sparse-phase-2 design (VERDICT r4 item 2a) is data-driven, not guessed.

Usage: python tools/stencil_stats.py [--width 1280 --height 720
        --scene SunTemple@small] [--cpu]
Prints one JSON line.
"""
import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--scene", default="SunTemple@small")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO, _normals_to_view
    from rtsdm_tpu.passes.svao_shift import svao_phase1_shift
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
    nv = jax.jit(lambda n: _normals_to_view(ctx, n))(packed)
    p1 = jax.jit(lambda d, n: svao_phase1_shift(
        cam, cfg, d, d, n, 0, "SingleDepth", "StochasticDepth"))(lin, nv)
    stencil = np.asarray(p1["stencil"])
    nd = cfg.num_directions

    bits = np.stack([(stencil >> i) & 1 for i in range(nd)], 0)  # [nd,H,W]
    out = {
        "scene": a.scene, "resolution": f"{width}x{height}",
        "num_directions": nd,
        "px_any_bit": float((stencil != 0).mean()),
        "bit_density_mean": float(bits.mean()),
        "bit_density_per_dir": [round(float(b.mean()), 4) for b in bits],
    }

    # tile occupancy: what fraction of [th, tw] tiles contain at least one
    # set bit for a given direction (= dense work a tile-skip phase 2 would
    # still do), at TPU-natural tile shapes
    for th, tw in ((8, 128), (16, 256), (32, 512)):
        hh = height - height % th
        ww = width - width % tw
        t = bits[:, :hh, :ww].reshape(nd, hh // th, th, ww // tw, tw)
        occ = t.any(axis=(2, 4))                       # [nd, TH, TW]
        out[f"tile{th}x{tw}_active_frac_per_dir"] = round(
            float(occ.mean()), 4)
        out[f"tile{th}x{tw}_active_frac_any"] = round(
            float(occ.any(axis=0).mean()), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
