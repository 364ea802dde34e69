"""MERL measured-material + PBRT closed-form families
(ops/bsdf_measured.py; reference Rendering/Materials/MERLMaterial.slang and
Rendering/Materials/PBRT/)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdm_tpu.ops import bsdf_measured as M


def _hemisphere(n_theta=32, n_phi=64):
    """Cosine-unweighted hemisphere grid + solid-angle weights around +Z."""
    th = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    ph = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    T, P = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                  np.cos(T)], -1).astype(np.float32)
    w = (np.sin(T) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)) \
        .astype(np.float32)
    return jnp.asarray(d.reshape(-1, 3)), jnp.asarray(w.reshape(-1))


def test_merl_file_roundtrip(tmp_path):
    tab = M.synthetic_merl()
    p = str(tmp_path / "synthetic.binary")
    M.save_merl(p, tab)
    got = M.load_merl(p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(tab),
                               rtol=1e-6, atol=1e-8)


def test_merl_constant_table_is_lambertian():
    """A constant table c is a constant BRDF: eval == c * cos(theta_i)."""
    c = np.asarray([0.3, 0.5, 0.7], np.float32)
    tab = jnp.broadcast_to(jnp.asarray(c),
                           (M.MERL_THETA_H, M.MERL_THETA_D, M.MERL_PHI_D, 3))
    rng = np.random.default_rng(3)
    n = jnp.asarray([0.0, 0.0, 1.0])[None].repeat(64, 0)
    wo = rng.normal(size=(64, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wo = jnp.asarray(wo / np.linalg.norm(wo, axis=1, keepdims=True))
    wi = rng.normal(size=(64, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wi = jnp.asarray(wi / np.linalg.norm(wi, axis=1, keepdims=True))
    got = np.asarray(M.eval_merl(tab, n, wo, wi))
    cos_i = np.asarray(jnp.sum(n * wi, -1))
    np.testing.assert_allclose(got, c[None] * cos_i[:, None],
                               rtol=1e-5, atol=1e-6)


def test_merl_reciprocity_of_bins():
    """Swapping wi/wo maps phi_d -> phi_d + pi, which the [0, pi) fold sends
    to the same database bin: the (theta_h, theta_d, phi_d) indices must be
    identical (the database assumes reciprocity)."""
    rng = np.random.default_rng(11)
    n = jnp.asarray([0.0, 0.0, 1.0])[None].repeat(128, 0)

    def rand_dirs():
        d = rng.normal(size=(128, 3)).astype(np.float32)
        d[:, 2] = np.abs(d[:, 2]) + 0.05
        return jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    wo, wi = rand_dirs(), rand_dirs()
    a = M.merl_indices(*M.merl_half_diff(n, wo, wi))
    b = M.merl_indices(*M.merl_half_diff(n, wi, wo))
    for x, y in zip(a, b):
        # allow a 1-bin boundary slip from fp in the angle fold
        assert (np.abs(np.asarray(x) - np.asarray(y)) <= 1).mean() > 0.99


def test_pbrt_diffuse_white_furnace():
    """f = albedo/pi: hemisphere integral of f*cos == albedo."""
    alb = jnp.asarray([0.8, 0.5, 0.2])
    dirs, w = _hemisphere()
    n = jnp.asarray([0.0, 0.0, 1.0])[None].repeat(dirs.shape[0], 0)
    wo = jnp.asarray([0.3, 0.1, 0.95])
    wo = (wo / jnp.linalg.norm(wo))[None].repeat(dirs.shape[0], 0)
    f_cos = M.eval_pbrt_diffuse(jnp.broadcast_to(alb, dirs.shape),
                                n, wo, dirs)
    integral = np.asarray(jnp.sum(f_cos * w[:, None], 0))
    np.testing.assert_allclose(integral, np.asarray(alb), rtol=2e-3)


def test_pbrt_conductor_fresnel_normal_incidence():
    """FrComplex at cos=1 must equal ((eta-1)^2 + k^2)/((eta+1)^2 + k^2)."""
    eta = jnp.asarray([0.2, 0.92, 1.1])
    k = jnp.asarray([3.9, 2.45, 2.14])
    got = np.asarray(M.fresnel_conductor(jnp.asarray([1.0]), eta, k))[0]
    e, kk = np.asarray(eta), np.asarray(k)
    want = ((e - 1) ** 2 + kk ** 2) / ((e + 1) ** 2 + kk ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pbrt_conductor_energy_bounded():
    """Hemisphere integral of the conductor lobe stays <= 1 per channel."""
    eta = jnp.asarray([0.2, 0.92, 1.1])
    k = jnp.asarray([3.9, 2.45, 2.14])
    dirs, w = _hemisphere()
    n = jnp.asarray([0.0, 0.0, 1.0])[None].repeat(dirs.shape[0], 0)
    wo = jnp.asarray([0.0, 0.0, 1.0])[None].repeat(dirs.shape[0], 0)
    for rough in (0.2, 0.6):
        f_cos = M.eval_pbrt_conductor(eta, k, jnp.float32(rough), n, wo,
                                      dirs)
        integral = np.asarray(jnp.sum(f_cos * w[:, None], 0))
        assert (integral <= 1.02).all() and (integral > 0.1).all(), integral


def test_pbrt_dielectric_fresnel_normal():
    got = float(np.asarray(M.fresnel_dielectric(jnp.asarray([1.0]), 1.5))[0])
    assert got == pytest.approx(((1.5 - 1) / (1.5 + 1)) ** 2, rel=1e-4)


def test_pbrt_dielectric_tir():
    """Above the critical angle (entering the denser medium, eta < 1 from
    this side) reflectance must be 1."""
    got = np.asarray(M.fresnel_dielectric(jnp.asarray([0.1, 0.9]), 1 / 1.5))
    assert got[0] == pytest.approx(1.0)
    assert got[1] < 1.0


@pytest.mark.parametrize("fam", ["MERL", "PBRTDiffuse", "PBRTConductor",
                                 "PBRTDielectric"])
def test_bsdf_viewer_runs_new_families(fam):
    from rtsdm_tpu.passes.bsdf_viewer import BSDFViewer
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box

    p = BSDFViewer({"bsdf": fam, "viewerMode": "Sphere"})
    ctx = RenderContext(width=48, height=48, scene=cornell_box(),
                        dictionary={})
    out, _ = p.execute(ctx, {})
    img = np.asarray(out["output"])
    assert np.isfinite(img).all()
    assert img.max() > 0.0
