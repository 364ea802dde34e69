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


def _many_lamp_scene(n_quads=33):
    """n_quads emissive quads (2*n_quads emitters) + floor: enough emitters
    that slot padding is exercised (e > max_clusters)."""
    tris, mids = [], []
    for i in range(n_quads):
        tris += _quad(-8.0 + 0.5 * i, 0.0, 2.0 + (i % 3), 0.3)
        mids += [1, 1]
    tris += _quad(0.0, 0.0, -1.0, 20.0)
    mids += [0, 0]
    mats = [dict(base_color=(0.5, 0.5, 0.5)),
            dict(base_color=(0, 0, 0), emissive=(4.0, 4.0, 4.0))]
    return make_scene("manylamps", np.asarray(tris, np.float32),
                      material_id=np.asarray(mids, np.int32),
                      materials=mats)


def test_cluster_no_dead_clusters():
    """With e > max_clusters the cluster count must come from the slot
    count: c=min(64,e) with row-major slot packing leaves trailing ALL-
    padding clusters (zero power), reachable through CDF-tail rounding."""
    sc = _many_lamp_scene(33)          # 66 emitters
    lc = lights.build_cluster_sampler(sc, max_clusters=64)
    assert float(jnp.min(lc["power"])) > 0.0   # every cluster has a real slot
    assert lc["n_clusters"] * lc["slot_count"] >= 66


def test_cluster_adversarial_cdf_tail_never_yields_zero_pdf():
    """u at the float32 top of [0,1): a padding slot (pdf_in 0) must never
    come back marked valid — that is the 1e8-amplified-firefly path."""
    sc = _many_lamp_scene(33)
    lc = lights.build_cluster_sampler(sc, max_clusters=64)
    n = 64
    p = jnp.asarray(np.random.default_rng(3).uniform(-8, 8, (n, 3))
                    .astype(np.float32))
    top = np.float32(1.0 - 2.0 ** -24)
    for u1v, u2v in [(top, top), (top, 0.0), (0.0, top), (0.5, top)]:
        u1 = jnp.full((n,), u1v, jnp.float32)
        u2 = jnp.full((n,), u2v, jnp.float32)
        wi, dist, le, pdf_w, valid, tid = lights.sample_clustered(
            lc, sc, p, u1, u2, jnp.full((n,), 0.3), jnp.full((n,), 0.4))
        v = np.asarray(valid)
        assert np.all(~v | (np.asarray(pdf_w) > 0.0))


def test_path_tracer_sampler_dispatch_follows_cfg(lamp_scene):
    """emissiveSampler edits after set_scene must take effect (the
    apply_ui/retrace path): dispatch is on cfg, tables rebuilt lazily."""
    from rtsdm_tpu.passes.path_tracer import PathTracer

    pt = PathTracer({"emissiveSampler": "Power"})
    pt.set_scene(lamp_scene)
    assert pt._active_clusters() is None
    pt.cfg["emissiveSampler"] = "LightBVH"
    cl = pt._active_clusters()
    assert cl is not None and cl["kind"] == "cluster"
    pt.cfg["emissiveSampler"] = "Power"
    assert pt._active_clusters() is None
