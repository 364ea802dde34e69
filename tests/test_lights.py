"""Emissive light sampling (ops/lights.py) — the LightBVH analogue.

Validates the two-level clustered sampler against the flat power sampler:
both are unbiased estimators of the same direct-lighting integral, the
clustered pdf queries are self-consistent, and the cluster importance
actually prefers nearby/facing clusters (the point of the hierarchy,
reference Rendering/Lights/LightBVH.h:57)."""
import numpy as np
import pytest

import jax.numpy as jnp

from rtsdm_tpu.ops import lights
from rtsdm_tpu.scene.scene import make_scene


def _quad(cx, cy, cz, size, axis=2):
    """Two triangles forming a size x size quad centered at (cx,cy,cz),
    facing -axis."""
    h = size / 2.0
    if axis == 2:
        a = [cx - h, cy - h, cz]
        b = [cx + h, cy - h, cz]
        c = [cx + h, cy + h, cz]
        d = [cx - h, cy + h, cz]
    else:
        a = [cx, cy - h, cz - h]
        b = [cx, cy - h, cz + h]
        c = [cx, cy + h, cz + h]
        d = [cx, cy + h, cz - h]
    return [[a, c, b], [a, d, c]]


@pytest.fixture(scope="module")
def lamp_scene():
    """Two separated emissive lamp quads (different power) + a floor."""
    tris = []
    mids = []
    tris += _quad(-2.0, 0.0, 2.0, 0.5)          # near lamp (for p at x<0)
    mids += [1, 1]
    tris += _quad(2.0, 0.0, 2.0, 1.0)           # far, stronger lamp
    mids += [2, 2]
    tris += _quad(0.0, 0.0, -1.0, 8.0)          # big dark floor
    mids += [0, 0]
    mats = [dict(base_color=(0.5, 0.5, 0.5)),
            dict(base_color=(0, 0, 0), emissive=(4.0, 4.0, 4.0)),
            dict(base_color=(0, 0, 0), emissive=(8.0, 8.0, 8.0))]
    return make_scene("lamps", np.asarray(tris, np.float32),
                      material_id=np.asarray(mids, np.int32),
                      materials=mats)


def _mc_irradiance(scene, sampler_fn, p, n_samples, seed=0):
    """Unshadowed irradiance at points p [N,3] via the given sampler:
    E = mean( Le * cos_surf / pdf_w ), receiver normal +z."""
    rng = np.random.default_rng(seed)
    n = p.shape[0]
    acc = np.zeros((n, 3), np.float64)
    for _ in range(n_samples):
        u = [jnp.asarray(rng.random(n).astype(np.float32))
             for _ in range(4)]
        wi, dist, le, pdf_w, valid, tid = sampler_fn(p, *u)
        cos_s = jnp.maximum(wi[:, 2], 0.0)
        contrib = np.asarray(le * (cos_s / jnp.maximum(pdf_w, 1e-8)
                                   * valid)[:, None])
        acc += contrib
    return acc / n_samples


def _flat_sampler(em, scene):
    def fn(p, u1, u2, u3, u4):
        idx = jnp.clip(jnp.searchsorted(em["cdf"], u1), 0,
                       em["ids"].shape[0] - 1)
        tid = em["ids"][idx]
        tri = scene.positions[tid]
        su = jnp.sqrt(u2)
        b1 = 1.0 - su
        b2 = u3 * su
        q = (tri[:, 0] * (1.0 - b1 - b2)[:, None] + tri[:, 1] * b1[:, None]
             + tri[:, 2] * b2[:, None])
        e1 = tri[:, 1] - tri[:, 0]
        e2 = tri[:, 2] - tri[:, 0]
        ln = jnp.cross(e1, e2)
        area = 0.5 * jnp.linalg.norm(ln, axis=-1)
        ln = ln / jnp.maximum(2.0 * area[:, None], 1e-8)
        to_q = q - p
        dist = jnp.linalg.norm(to_q, axis=-1)
        wi = to_q / jnp.maximum(dist[:, None], 1e-8)
        cos_l = jnp.abs(jnp.sum(ln * wi, -1))
        le = scene.mat_emissive[scene.material_id[tid]]
        pdf_w = dist * dist * em["pdf_area"][idx] / jnp.maximum(cos_l, 1e-8)
        valid = (cos_l > 1e-4) & (dist > 1e-4)
        return wi, dist, le, pdf_w, valid, tid
    return fn


def test_cluster_build_shapes(lamp_scene):
    lc = lights.build_cluster_sampler(lamp_scene, max_clusters=2)
    assert lc["n_clusters"] == 2
    c, s = lc["cdf_in"].shape
    assert (c, s) == (2, 2)
    # each cluster's bounding sphere covers its triangles' vertices
    pos = np.asarray(lamp_scene.positions)
    tid = np.asarray(lc["tid"])
    for ci in range(c):
        verts = pos[tid[ci]].reshape(-1, 3)
        d = np.linalg.norm(verts - np.asarray(lc["center"])[ci], axis=-1)
        assert d.max() <= float(lc["radius"][ci]) + 1e-4


def test_clustered_matches_power_estimate(lamp_scene):
    """Both samplers estimate the same integral (unbiasedness): the
    clustered estimate must agree with the flat power estimate."""
    em = lights.build_power_sampler(lamp_scene)
    lc = lights.build_cluster_sampler(lamp_scene, max_clusters=2)
    p = jnp.asarray([[-2.0, 0.0, 0.0], [2.0, 0.0, 0.0],
                     [0.0, 1.0, 0.5]], jnp.float32)

    def clustered(pp, u1, u2, u3, u4):
        return lights.sample_clustered(lc, lamp_scene, pp, u1, u2, u3, u4)

    e_flat = _mc_irradiance(lamp_scene, _flat_sampler(em, lamp_scene),
                            p, 600, seed=1)
    e_clus = _mc_irradiance(lamp_scene, clustered, p, 600, seed=2)
    assert np.all(e_flat[:, 0] > 0.05)
    np.testing.assert_allclose(e_clus, e_flat, rtol=0.15)


def test_clustered_pdf_query_consistent(lamp_scene):
    """pdf_clustered_w(p, wi, t, tid) must reproduce the pdf the sampler
    reported for its own draws (the MIS contract)."""
    lc = lights.build_cluster_sampler(lamp_scene, max_clusters=2)
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    u = [jnp.asarray(rng.random(64).astype(np.float32)) for _ in range(4)]
    wi, dist, le, pdf_w, valid, tid = lights.sample_clustered(
        lc, lamp_scene, p, *u)
    pdf_q = lights.pdf_clustered_w(lc, lamp_scene, p, wi, dist, tid)
    m = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(pdf_q)[m], np.asarray(pdf_w)[m],
                               rtol=1e-3)


def test_cluster_importance_prefers_near_facing(lamp_scene):
    """A point right under the near lamp must pick that lamp's cluster far
    more often than power-proportional would (the LightBVH payoff)."""
    lc = lights.build_cluster_sampler(lamp_scene, max_clusters=2)
    # which cluster holds the near (-2,0,2) lamp?
    tid = np.asarray(lc["tid"])
    pos = np.asarray(lamp_scene.positions)
    near_ci = int(np.argmin([np.abs(pos[tid[ci]].reshape(-1, 3)[:, 0]
                                    + 2.0).max() for ci in range(2)]))
    p = jnp.asarray([[-2.0, 0.0, 1.5]] * 256, jnp.float32)
    rng = np.random.default_rng(4)
    u1 = jnp.asarray(rng.random(256).astype(np.float32))
    _, pick = lights._cluster_pdf_and_pick(lc, p, u1)
    frac_near = float(np.mean(np.asarray(pick) == near_ci))
    # power-proportional would pick the near (weaker) lamp ~1/3 of the time
    assert frac_near > 0.75


def test_path_tracer_lightbvh_mode(lamp_scene):
    """The PathTracer renders with emissiveSampler=LightBVH and matches its
    own Power-sampler output (same estimand) within MC noise."""
    from rtsdm_tpu.passes.path_tracer import PathTracer

    class Ctx:
        scene = lamp_scene
        width = 16
        height = 16
        frame_index = 0
        time = 0.0

    outs = {}
    for sampler in ("Power", "LightBVH"):
        pt = PathTracer(dict(samplesPerPixel=4, maxSurfaceBounces=1,
                             emissiveSampler=sampler, chunk=64))
        pt.set_scene(lamp_scene)
        out, _ = pt.execute(Ctx(), {})
        outs[sampler] = np.asarray(out["color"])
        assert np.isfinite(outs[sampler]).all()
    # per-pixel MC noise doesn't cancel in L1 — compare image means (both
    # estimate the same integral, so means must agree well inside noise)
    m_p, m_l = outs["Power"].mean(), outs["LightBVH"].mean()
    assert abs(m_p - m_l) / (abs(m_p) + 1e-6) < 0.15
