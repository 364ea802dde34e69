"""Headline benchmark: SVAO Ray-SD AO time at 1920x1080 on one TPU chip.

Measures the AO portion of the frame (SVAO phase 1 + ray-traced stochastic
depth map + phase 2 resolve — the passes the north star bounds at 10 ms,
BASELINE.json) on the Sun Temple stand-in scene, steady state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 10.0 (the 10 ms/frame north-star budget; < 1.0 beats it).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax


def main():
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import sun_temple
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)

    width, height = 1920, 1080
    scene = sun_temple(aspect=width / height)

    g = raster_gbuffer(scene, width, height, max_per_tile=512)
    lin = scene.camera.linearize_depth(g["depth"])
    packed = encode_normal_2x16(
        normalize(transform_vector(scene.camera.view_mat, g["faceNormalW"])))
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
    args = (scene, g["depth"], lin, packed)
    jax.block_until_ready(fn(*args))  # compile
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3

    print(json.dumps({
        "metric": "svao_ray_sd_ao_ms_per_frame_1080p",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms / 10.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
