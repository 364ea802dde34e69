"""SVAO + stochastic depth tests (small res, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdm_tpu.passes.gbuffer import raster_gbuffer
from rtsdm_tpu.passes.svao import SVAO
from rtsdm_tpu.rendergraph.render_pass import RenderContext
from rtsdm_tpu.scene.procedural import cornell_box
from rtsdm_tpu.utils.math import (encode_normal_2x16, normalize,
                                  transform_vector)


@pytest.fixture(scope="module")
def gbuf():
    scene = cornell_box()
    w = h = 96
    g = raster_gbuffer(scene, w, h, max_per_tile=64)
    lin = scene.camera.linearize_depth(g["depth"])
    packed = encode_normal_2x16(
        normalize(transform_vector(scene.camera.view_mat, g["faceNormalW"])))
    return scene, g, lin, packed, (w, h)


def _run(scene, g, lin, packed, wh, props):
    w, h = wh
    ctx = RenderContext(width=w, height=h, scene=scene,
                        dictionary={"guardBand": 0})
    p = SVAO(dict(props, radius=0.2))
    p.set_scene(scene)
    out, _ = p.execute(ctx, {"gbufferDepth": g["depth"], "depth": lin,
                             "depth2": lin, "normals": packed, "color": None})
    return out


def test_svao_single_depth(gbuf):
    out = _run(*gbuf, {"secondaryDepthMode": "SingleDepth"})
    ao = np.asarray(out["ao"])
    assert np.isfinite(ao).all()
    assert 0.0 <= ao.min() < 0.6          # corners occluded
    assert ao.max() == pytest.approx(1.0, abs=1e-3)
    assert 0.7 < ao.mean() < 0.99
    # stencil marks a plausible refinement fraction
    st = np.asarray(out["stencil"])
    assert 0.01 < (st != 0).mean() < 0.7


def test_svao_ray_sd_darkens_refined_pixels(gbuf):
    out1 = _run(*gbuf, {"secondaryDepthMode": "SingleDepth"})
    out2 = _run(*gbuf, {"secondaryDepthMode": "StochasticDepth",
                        "stochasticDepthImpl": "Ray", "stochMapDivisor": 2,
                        "stochMapGuardBand": 64})
    ao1 = np.asarray(out1["ao"])
    ao2 = np.asarray(out2["ao"])
    st = np.asarray(out2["stencil"])
    assert np.isfinite(ao2).all()
    refined = st != 0
    assert refined.any()
    # refinement must actually find occluders in the cornell box; note
    # off-screen samples re-resolve from a neutral start and may brighten
    # (Common.slang:581 resetSample), so monotonicity only holds in aggregate
    assert (ao2[refined] < ao1[refined] - 1e-3).any()
    assert ao2[refined].mean() <= ao1[refined].mean() + 0.02
    # ray intervals: requested texels have max >= min where both written
    rmin = np.asarray(out2["internalRayMin"])
    rmax = np.asarray(out2["internalRayMax"])
    req = (rmax > 0) & (rmin < 1e37)
    assert req.any()
    assert (rmax[req] >= rmin[req]).all()


def test_svao_raster_sd(gbuf):
    out = _run(*gbuf, {"secondaryDepthMode": "StochasticDepth",
                       "stochasticDepthImpl": "Raster", "stochMapDivisor": 2})
    ao = np.asarray(out["ao"])
    assert np.isfinite(ao).all() and ao.min() >= 0.0 and ao.max() <= 1.0


def test_svao_raytraced(gbuf):
    out = _run(*gbuf, {"secondaryDepthMode": "Raytraced", "rtChunk": 64})
    ao = np.asarray(out["ao"])
    assert np.isfinite(ao).all() and ao.min() >= 0.0 and ao.max() <= 1.0


def test_sd_trace_depth_ordering():
    """kbuffer mode returns the nearest hits; default mode a random subset —
    both within [0,1] normalized depth."""
    from rtsdm_tpu.ops import rt
    scene = cornell_box()
    cam = scene.camera
    origins = jnp.broadcast_to(cam.pos_w, (64, 3))
    # rays toward the room through slightly varied directions
    d0 = normalize(jnp.asarray([[0.0, 0.0, -1.0]]))
    dirs = normalize(d0 + jnp.linspace(-0.1, 0.1, 64)[:, None]
                     * jnp.asarray([[1.0, 0.3, 0.0]]))
    tmin = jnp.zeros(64)
    tmax = jnp.full((64,), 100.0)
    d_k = rt.sd_trace(scene, origins, dirs, tmin, tmax, num_samples=4,
                      kbuffer=True, cull=rt.CULL_NONE)
    assert d_k.shape == (64, 4)
    dd = np.asarray(d_k)
    assert (dd >= 0).all() and (dd <= 1.0).all()
    # kbuffer is sorted ascending by construction (keys = depth)
    assert (np.diff(dd, axis=1) >= -1e-6).all()
    # at least the first hit exists for central rays
    assert (dd[:, 0] < 1.0).any()


def test_band_renderer_multichip():
    """8-band sharded FLAGSHIP pipeline (SVAO + per-band Ray-SD trace) on the
    virtual CPU mesh must match the identical pipeline on 1 device exactly:
    the ppermute halo exchange supplies the same rows a single device sees."""
    from rtsdm_tpu.parallel.tiles import make_svao_rt_band_renderer
    n = 8
    w, h = 64, 32 * n
    scene = cornell_box(aspect=w / h)
    kw = dict(divisor=4, sd_guard=4, num_directions=4, stoch_samples=2,
              max_per_tile=48, radius=0.2, ss_max_radius=4.0)
    mesh, fn = make_svao_rt_band_renderer(w, h, n, **kw)
    ao, color = jax.jit(fn)(scene)
    ao = np.asarray(ao)
    assert ao.shape == (h, w) and np.isfinite(ao).all()
    assert np.asarray(color).shape == (h, w, 3)
    assert 0.0 <= ao.min() and ao.max() <= 1.0 and ao.min() < 0.9

    mesh1, fn1 = make_svao_rt_band_renderer(w, h, 1, **kw)
    ao1, _ = jax.jit(fn1)(scene)
    diff = np.abs(ao - np.asarray(ao1))
    assert diff.max() < 1e-4, f"band seam error {diff.max()}"


def test_band_renderer_screen_space_only():
    """The SD-less sharded variant stays healthy (legacy make_band_renderer)."""
    from rtsdm_tpu.parallel.tiles import make_band_renderer
    n = 4
    w, h = 64, 32 * n
    scene = cornell_box(aspect=w / h)
    mesh, fn = make_band_renderer(w, h, n, halo=16, num_directions=4,
                                  max_per_tile=48, radius=0.1)
    ao, color = jax.jit(fn)(scene)
    ao = np.asarray(ao)
    assert ao.shape == (h, w) and np.isfinite(ao).all()
