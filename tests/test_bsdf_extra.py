"""Cloth + hair BSDF family (VERDICT r3 item 8).

References: ClothBRDF.slang:43 (sheen D * Neubelt V + Lambert),
HairChiang16.slang:1 / Chiang et al. 2016 (R/TT/TRT + residual lobes).
The hair test is the model's canonical validation: the white furnace
(sigma_a = 0 => all energy leaves the fiber, so the full-sphere integral of
f*cos must be 1 for any roughness).
"""
import numpy as np
import jax.numpy as jnp

from rtsdm_tpu.ops.bsdf_extra import eval_cloth, eval_hair


def _sphere_grid(nt=192, nph=192):
    th = (np.arange(nt) + 0.5) / nt * np.pi - np.pi / 2
    ph = (np.arange(nph) + 0.5) / nph * 2 * np.pi
    t, p = np.meshgrid(th, ph, indexing="ij")
    wi = np.stack([np.sin(t), np.cos(t) * np.cos(p),
                   np.cos(t) * np.sin(p)], -1).astype(np.float32)
    dw = np.cos(t) * (np.pi / nt) * (2 * np.pi / nph)
    return jnp.asarray(wi), dw


def test_hair_white_furnace():
    wi, dw = _sphere_grid()
    for beta in (0.15, 0.35, 0.7):
        for to in (0.1, 0.9):
            wo = jnp.broadcast_to(jnp.asarray(
                [np.sin(to), np.cos(to), 0.0], jnp.float32), wi.shape)
            f = eval_hair(jnp.zeros(wi.shape[:-1] + (3,)), beta, beta,
                          wo, wi, h=0.3)
            integ = float((np.asarray(f[..., 0]) * dw).sum())
            assert abs(integ - 1.0) < 0.03, (beta, to, integ)


def test_hair_absorption_darkens():
    wi, dw = _sphere_grid(96, 96)
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.95, 0.0], jnp.float32)
                          / np.sqrt(0.3 ** 2 + 0.95 ** 2), wi.shape)
    f0 = eval_hair(jnp.zeros(wi.shape[:-1] + (3,)), 0.3, 0.3, wo, wi)
    fa = eval_hair(jnp.full(wi.shape[:-1] + (3,), 1.5), 0.3, 0.3, wo, wi)
    e0 = float((np.asarray(f0[..., 0]) * dw).sum())
    ea = float((np.asarray(fa[..., 0]) * dw).sum())
    # absorbing fiber keeps the R lobe but kills most of TT/TRT
    assert ea < 0.6 * e0
    assert ea > 0.01  # the surface reflection lobe survives


def test_cloth_reciprocity_and_sheen():
    rng = np.random.default_rng(4)
    n = jnp.asarray([0.0, 0.0, 1.0])
    nb = jnp.broadcast_to(n, (32, 3))
    v = rng.standard_normal((32, 3)).astype(np.float32)
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    w1 = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
    v2 = rng.standard_normal((32, 3)).astype(np.float32)
    v2[:, 2] = np.abs(v2[:, 2]) + 0.05
    w2 = jnp.asarray(v2 / np.linalg.norm(v2, axis=-1, keepdims=True))
    alb = jnp.full((32, 3), 0.5)
    f0 = jnp.full((32, 3), 0.04)
    r = jnp.full((32,), 0.5)
    a = np.asarray(eval_cloth(alb, f0, r, nb, w1, w2))
    b = np.asarray(eval_cloth(alb, f0, r, nb, w2, w1))
    cos1 = np.asarray(jnp.sum(nb * w2, -1))[:, None]
    cos2 = np.asarray(jnp.sum(nb * w1, -1))[:, None]
    # f = f_cos / cos_i must be symmetric under wi<->wo exchange
    np.testing.assert_allclose(a / np.maximum(cos1, 1e-6),
                               b / np.maximum(cos2, 1e-6), rtol=1e-4,
                               atol=1e-5)
    assert (a >= 0).all()

    # sheen signature: at grazing half-angles the specular term dominates
    # the normal-incidence response (inverted-Gaussian D peaks at sin h = 1)
    wo_n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi_n = jnp.asarray([[0.0, 0.0, 1.0]])
    graze = np.float32([0.9, 0.0, np.sqrt(1 - 0.81)])
    wo_g = jnp.asarray([graze])
    wi_g = jnp.asarray([[-0.9, 0.0, np.sqrt(1 - 0.81)]])
    one = jnp.ones((1,)) * 0.5
    black = jnp.zeros((1, 3))  # isolate the sheen lobe
    f_norm = np.asarray(eval_cloth(black, jnp.full((1, 3), 1.0), one,
                                   jnp.asarray([[0., 0., 1.]]), wo_n, wi_n))
    f_graze = np.asarray(eval_cloth(black, jnp.full((1, 3), 1.0), one,
                                    jnp.asarray([[0., 0., 1.]]), wo_g, wi_g))
    cos_n, cos_g = 1.0, float(np.sqrt(1 - 0.81))
    assert (f_graze[0, 0] / cos_g) > (f_norm[0, 0] / cos_n)


def test_bsdf_viewer_families_render():
    from rtsdm_tpu.passes.bsdf_viewer import BSDFViewer
    from rtsdm_tpu.rendergraph.render_pass import RenderContext
    from rtsdm_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    ctx = RenderContext(width=32, height=32, scene=scene, dictionary={})
    imgs = {}
    for fam in ("Standard", "Cloth", "HairChiang16"):
        for mode in ("Slice", "Sphere"):
            p = BSDFViewer({"bsdf": fam, "viewerMode": mode})
            out, _ = p.execute(ctx, {})
            img = np.asarray(out["output"])
            assert np.isfinite(img).all(), (fam, mode)
            assert (img >= 0).all(), (fam, mode)
            assert img.max() > 1e-4, (fam, mode)
            imgs[(fam, mode)] = img
    # the families are actually different BSDFs
    assert np.abs(imgs[("Cloth", "Sphere")]
                  - imgs[("Standard", "Sphere")]).max() > 1e-3
    assert np.abs(imgs[("HairChiang16", "Sphere")]
                  - imgs[("Standard", "Sphere")]).max() > 1e-3
