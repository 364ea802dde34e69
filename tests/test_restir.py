"""ReSTIR reservoir machinery behind RTXDIPass (VERDICT r3 item 7).

Correctness anchors:
- The analytic-light pool is checked against the EXACT estimand (mode
  "Exact" shades every light in a closed-form loop, passes/lighting._shade)
  — the K-frame ReSTIR mean must converge to it (RIS unbiasedness).
- The emissive pool is checked against a brute-force many-sample NEE sum
  through the same clustered sampler.
- Reuse must help: at an equal 1-final-sample budget, candidates+spatial
  reuse beats the naive 1-candidate estimator, and temporal reuse keeps
  improving a static view.
Reference: Source/Falcor/Rendering/RTXDI/RTXDI.h:1.
"""
import numpy as np
import jax.numpy as jnp

from rtsdm_tpu.passes.rtxdi import RTXDIPass
import rtsdm_tpu.passes  # noqa: F401 (populate the pass registry)
from rtsdm_tpu.rendergraph.render_pass import RenderContext
from rtsdm_tpu.scene.procedural import cornell_box
from rtsdm_tpu.scene.scene import LIGHT_POINT
from rtsdm_tpu.utils.structs import replace

W = H = 48


def _multilight_scene(n=6, seed=3):
    scene = cornell_box()
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0.3, 1.7, n), rng.uniform(0.6, 1.8, n),
                    rng.uniform(0.3, 1.7, n)], -1)
    inten = rng.uniform(0.3, 1.5, (n, 3))
    return replace(scene,
                   light_type=jnp.full((n,), LIGHT_POINT, jnp.int32),
                   light_pos=jnp.asarray(pos, jnp.float32),
                   light_dir=jnp.zeros((n, 3), jnp.float32),
                   light_intensity=jnp.asarray(inten, jnp.float32))


def _vbuffer(scene, w=W, h=H):
    from rtsdm_tpu.rendergraph.render_pass import create_pass
    vb = create_pass("VBufferRaster", {"maxPerTile": 128})
    vb.set_scene(scene)
    ctx = RenderContext(width=w, height=h, scene=scene, dictionary={})
    out, _ = vb.execute(ctx, {})
    return out["vbuffer"]


def _run(scene, vb, cfg, frames=1, thread_state=True):
    p = RTXDIPass(cfg)
    p.set_scene(scene)
    outs, state = [], None
    for f in range(frames):
        ctx = RenderContext(width=W, height=H, scene=scene, frame_index=f,
                            dictionary={})
        out, state = p.execute(ctx, {"vbuffer": vb},
                               state if thread_state else None)
        outs.append(np.asarray(out["color"]))
    return outs


def _mask(scene, vb):
    return np.asarray(vb[..., 0] >= 0)


def test_restir_analytic_pool_is_unbiased():
    scene = _multilight_scene()
    vb = _vbuffer(scene)
    oracle = _run(scene, vb, dict(mode="Exact", rayShadows=False))[0]
    frames = _run(scene, vb,
                  dict(mode="ReSTIR", rayShadows=False,
                       candidatesAnalytic=4, candidatesEmissive=0,
                       spatialTaps=2, spatialRadius=4),
                  frames=40, thread_state=False)
    mean = np.mean(frames, 0)
    m = _mask(scene, vb)
    rel = np.abs(mean[m] - oracle[m]).mean() / max(oracle[m].mean(), 1e-6)
    assert np.isfinite(mean).all()
    assert rel < 0.06, rel


def test_restir_beats_naive_at_equal_ray_budget():
    scene = _multilight_scene(n=8, seed=11)
    vb = _vbuffer(scene)
    oracle = _run(scene, vb, dict(mode="Exact", rayShadows=False))[0]
    m = _mask(scene, vb)

    def mse(cfg, frames=6):
        outs = _run(scene, vb, cfg, frames=frames, thread_state=False)
        return np.mean([((o - oracle) ** 2)[m].mean() for o in outs])

    naive = mse(dict(mode="ReSTIR", rayShadows=False, candidatesAnalytic=1,
                     candidatesEmissive=0, spatialTaps=0))
    ris = mse(dict(mode="ReSTIR", rayShadows=False, candidatesAnalytic=8,
                   candidatesEmissive=0, spatialTaps=4, spatialRadius=3))
    assert ris < 0.5 * naive, (ris, naive)


def test_restir_emissive_pool_matches_brute_force():
    scene = cornell_box()
    vb = _vbuffer(scene)
    # brute-force NEE through the same clustered sampler
    from rtsdm_tpu.ops import lights as L
    from rtsdm_tpu.ops import brdf
    from rtsdm_tpu.ops.restir import _pixel_seeds, _rand01
    from rtsdm_tpu.passes.lighting import shading_inputs
    from rtsdm_tpu.passes.gbuffer_rt import _materialize
    lc = L.build_cluster_sampler(scene)
    assert lc is not None
    tid = vb[..., 0].astype(jnp.int32)
    g = _materialize(scene, scene.camera, tid, vb[..., 1:3],
                     jnp.zeros(tid.shape), W, H)
    si = shading_inputs(scene, g)
    flat_p = si["p"].reshape(-1, 3)
    acc = jnp.zeros((H, W, 3))
    n_mc = 128
    for s in range(n_mc):
        us = [_rand01(_pixel_seeds(H, W, 9000 + s, i)).reshape(-1)
              for i in range(4)]
        wi, dist, le, pdf_w, valid, _ = L.sample_clustered(
            lc, scene, flat_p, us[0], us[1], us[2], us[3])
        wi = wi.reshape(H, W, 3)
        f_cos = brdf.eval_lobes(si["diff_albedo"], si["f0"], si["rough"],
                                si["n"], si["wo"], wi)
        term = f_cos * le.reshape(H, W, 3) \
            / jnp.maximum(pdf_w.reshape(H, W), 1e-8)[..., None]
        acc = acc + jnp.where(valid.reshape(H, W)[..., None], term, 0.0)
    brute = np.asarray(acc / n_mc)

    # subtract the base terms (emissive + ambient/env are in the pass
    # output; with ambient/env zeroed only surface emission remains)
    base = _run(scene, vb,
                dict(mode="ReSTIR", rayShadows=False, candidatesAnalytic=0,
                     candidatesEmissive=0, ambientIntensity=0.0,
                     envMapIntensity=0.0))[0]
    m = _mask(scene, vb) & (brute.sum(-1) > 1e-4)

    def mean_of(taps, frames=48):
        outs = _run(scene, vb,
                    dict(mode="ReSTIR", rayShadows=False,
                         candidatesAnalytic=0, candidatesEmissive=4,
                         spatialTaps=taps, spatialRadius=4,
                         ambientIntensity=0.0, envMapIntensity=0.0),
                    frames=frames, thread_state=False)
        return np.mean(outs, 0) - base

    # pure RIS (no reuse) is unbiased: the signed mean error is MC noise
    mean0 = mean_of(0)
    signed0 = (mean0[m] - brute[m]).mean() / max(brute[m].mean(), 1e-6)
    assert abs(signed0) < 0.05, signed0
    # spatial reuse uses the biased combine (the RTXDI default mode:
    # rejected-neighbor M still counts); its energy bias must stay bounded
    # by the depth/normal rejection thresholds
    mean2 = mean_of(2)
    signed2 = (mean2[m] - brute[m]).mean() / max(brute[m].mean(), 1e-6)
    assert abs(signed2) < 0.10, signed2


def test_restir_temporal_reuse_improves_static_view():
    scene = _multilight_scene(n=8, seed=21)
    vb = _vbuffer(scene)
    oracle = _run(scene, vb, dict(mode="Exact", rayShadows=False))[0]
    m = _mask(scene, vb)
    outs = _run(scene, vb,
                dict(mode="ReSTIR", rayShadows=False, candidatesAnalytic=2,
                     candidatesEmissive=0, spatialTaps=1, spatialRadius=4),
                frames=8, thread_state=True)
    first = ((outs[0] - oracle) ** 2)[m].mean()
    last = np.mean([((o - oracle) ** 2)[m].mean() for o in outs[-3:]])
    assert last < first * 0.7, (first, last)


def test_restir_with_shadows_is_bounded_by_unshadowed():
    scene = _multilight_scene(n=4, seed=5)
    vb = _vbuffer(scene)
    lit = _run(scene, vb, dict(mode="ReSTIR", rayShadows=False,
                               candidatesAnalytic=4, candidatesEmissive=0))[0]
    shad = _run(scene, vb, dict(mode="ReSTIR", rayShadows=True,
                                candidatesAnalytic=4,
                                candidatesEmissive=0))[0]
    m = _mask(scene, vb)
    assert np.isfinite(shad).all()
    assert (shad[m] <= lit[m] + 1e-4).all()
    assert shad[m].mean() < lit[m].mean()  # the blocks do cast shadows
