"""Non-Standard material BSDFs: cloth sheen and hair (Chiang16 family).

Reference surfaces:
- ClothBRDF: Source/Falcor/Rendering/Materials/ClothBRDF.slang:43 — the
  Estevez-Kulla "Production Friendly Microfacet Sheen" D with the
  Neubelt-Pettineo visibility term over a Lambert diffuse base.
- HairChiang16: Source/Falcor/Rendering/Materials/HairChiang16.slang:1 —
  the Chiang et al. 2016 fiber model ("A Practical and Controllable Hair
  and Fur Model") as also published in pbrt-v3: longitudinal Gaussian-like
  lobes M_p (Bessel-I0 form), trimmed-logistic azimuthal lobes N_p, and
  Fresnel/absorption attenuations A_p over p = R, TT, TRT, residual.

Both are implemented from the published models as dense vectorized math
(every input may be an [H,W] field) — no data-dependent control flow, so
they jit and fuse like the rest of the shading stack. Consumed by
BSDFViewer (bsdf="Cloth"/"HairChiang16") and available to material-aware
shading via ops dispatch.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import normalize, saturate

_PI = 3.14159265358979
_SQRT_PI_OVER_8 = 0.626657069


# ---------------------------------------------------------------------------
# Cloth sheen BRDF (ClothBRDF.slang:98-160)
# ---------------------------------------------------------------------------

def _d_sheen(rough, n_dot_h):
    inv_alpha = 1.0 / jnp.maximum(rough, 1e-3)
    cos2h = n_dot_h * n_dot_h
    sin2h = jnp.maximum(1.0 - cos2h, 0.0078125)
    return (2.0 + inv_alpha) * jnp.power(sin2h, inv_alpha * 0.5) \
        / (2.0 * _PI)


def _v_neubelt(n_dot_i, n_dot_o):
    return 1.0 / jnp.maximum(4.0 * (n_dot_o + n_dot_i - n_dot_o * n_dot_i),
                             1e-6)


def eval_cloth(diffuse_color, f0, rough, n, wo, wi):
    """f*cos for the cloth BRDF in world space (same contract as
    ops/brdf.eval_lobes). diffuse_color/f0: [...,3]; rough: [...]."""
    n_dot_l = jnp.sum(n * wi, -1)
    n_dot_v = jnp.sum(n * wo, -1)
    h = normalize(wo + wi)
    n_dot_h = saturate(jnp.sum(n * h, -1))
    d = _d_sheen(rough, n_dot_h)
    vis = _v_neubelt(saturate(n_dot_l), saturate(n_dot_v))
    spec = (d * vis)[..., None] * f0
    diff = diffuse_color / _PI
    valid = (n_dot_l > 1e-5) & (n_dot_v > 1e-5)
    return jnp.where(valid[..., None],
                     (diff + spec) * saturate(n_dot_l)[..., None], 0.0)


# ---------------------------------------------------------------------------
# Hair (Chiang 2016); local fiber frame: +x along the fiber, (y,z) is the
# cross-section plane. wi/wo are unit vectors in that frame.
# ---------------------------------------------------------------------------

P_MAX = 3  # explicit lobes R, TT, TRT; p=3 aggregates the residual


def _i0(x):
    """Modified Bessel I0 via its power series (x <= ~12 in practice:
    arguments are cos/cos / v with v >= ~0.02 handled by _log_i0)."""
    val = jnp.ones_like(x)
    term = jnp.ones_like(x)
    x2 = 0.25 * x * x
    for i in range(1, 10):
        term = term * x2 / (i * i)
        val = val + term
    return val


def _log_i0(x):
    """log I0(x), switching to the asymptotic form for large x."""
    big = x > 12.0
    safe = jnp.minimum(x, 12.0)
    small = jnp.log(_i0(safe))
    asym = x + 0.5 * (-jnp.log(2.0 * _PI) + jnp.log(1.0 /
                                                    jnp.maximum(x, 1e-6)))
    return jnp.where(big, asym, small)


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering lobe (Chiang16 eq. 7 / pbrt-v3 Mp)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small_v = v <= 0.1
    # numerically-stable branch for small variance
    lo = jnp.exp(_log_i0(a) - b - 1.0 / jnp.maximum(v, 1e-6)
                 + 0.6931 + jnp.log(1.0 / (2.0 * jnp.maximum(v, 1e-6))))
    hi = (jnp.exp(-b) * _i0(a)) \
        / (jnp.sinh(1.0 / jnp.maximum(v, 1e-6)) * 2.0 * v)
    return jnp.where(small_v, lo, hi)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _np(phi, p, s, gamma_o, gamma_t):
    """Azimuthal lobe: trimmed logistic around the exact fiber deflection
    Phi(p) = 2 p gamma_t - 2 gamma_o + p pi."""
    dphi = phi - (2.0 * p * gamma_t - 2.0 * gamma_o + p * _PI)
    # wrap to [-pi, pi] without data-dependent loops
    dphi = jnp.arctan2(jnp.sin(dphi), jnp.cos(dphi))
    return _trimmed_logistic(dphi, s, -_PI, _PI)


def _fr_dielectric(cos_i, eta):
    """Unpolarized Fresnel for a dielectric (air -> eta)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = jnp.maximum(0.0, 1.0 - cos_i * cos_i) / (eta * eta)
    total = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-6)
    r_per = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-6)
    f = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(total, 1.0, f)


def eval_hair(sigma_a, beta_m, beta_n, wo, wi, h=0.3, eta=1.55, alpha=0.0):
    """Hair BSDF f(wo, wi) * |cos(theta_i)| in the LOCAL fiber frame
    (+x = fiber tangent). sigma_a: [...,3] absorption; beta_m/beta_n in
    (0,1]; h in [-1,1] is the normalized cross-section offset.

    Implements the four-lobe Chiang16 sum: A_p(fresnel/absorption) *
    M_p(longitudinal) * N_p(azimuthal); lobe p=3 carries the residual
    energy with an isotropic azimuth so the white-furnace test closes.
    The cuticle-scale tilt `alpha` shifts the R/TT/TRT longitudinal angles
    (HairChiang16.slang applies the same three-lobe rotation)."""
    sin_to = wo[..., 0]
    cos_to = jnp.sqrt(jnp.maximum(1.0 - sin_to * sin_to, 1e-9))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = wi[..., 0]
    cos_ti = jnp.sqrt(jnp.maximum(1.0 - sin_ti * sin_ti, 1e-9))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    phi = phi_i - phi_o

    # longitudinal variances per lobe from beta_m (Chiang16 eq. 12)
    v0 = (0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20) ** 2
    v = [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]
    # azimuthal logistic scale from beta_n
    s = _SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * beta_n ** 2
                           + 5.372 * beta_n ** 22)

    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    # refracted geometry
    sin_tt = sin_to / eta
    cos_tt = jnp.sqrt(jnp.maximum(1.0 - sin_tt * sin_tt, 1e-9))
    etap = jnp.sqrt(jnp.maximum(eta * eta - sin_to * sin_to, 1e-9)) \
        / jnp.maximum(cos_to, 1e-6)
    sin_gt = h / etap
    cos_gt = jnp.sqrt(jnp.maximum(1.0 - sin_gt * sin_gt, 1e-9))
    gamma_t = jnp.arcsin(jnp.clip(sin_gt, -1.0, 1.0))

    # attenuation chain A_p (Chiang16 eq. 6)
    cos_half = cos_to * jnp.cos(gamma_o)
    f = _fr_dielectric(cos_half, eta)[..., None]
    t = jnp.exp(-sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-6))
                [..., None])
    ap = [f,
          (1.0 - f) ** 2 * t,
          (1.0 - f) ** 2 * t ** 2 * f,
          (1.0 - f) ** 2 * t ** 3 * f * f
          / jnp.maximum(1.0 - t * f, 1e-6)]

    # per-lobe cuticle tilt of the outgoing longitudinal angle
    # (R: -2a, TT: +a, TRT: +4a), applied via sin/cos rotation identities
    def tilted(sin_t, cos_t, shift):
        si = sin_t * jnp.cos(shift) - cos_t * jnp.sin(shift)
        return si, jnp.abs(sin_t * jnp.sin(shift) + cos_t * jnp.cos(shift))

    shifts = [-2.0 * alpha, alpha, 4.0 * alpha, 0.0]
    out = jnp.zeros(wo.shape[:-1] + (3,))
    for p in range(P_MAX + 1):
        sin_top, cos_top = tilted(sin_to, cos_to, shifts[p])
        mp = _mp(cos_ti, cos_top, sin_ti, sin_top, v[p])
        if p < P_MAX:
            npp = _np(phi, p, s, gamma_o, gamma_t)
        else:
            npp = jnp.full(phi.shape, 1.0 / (2.0 * _PI))
        out = out + ap[p] * (mp * npp)[..., None]
    # the model is defined with the 1/cos^2(theta) terms folded into M/N;
    # divide by |cos theta_i| is NOT applied: this returns f * cos_i as the
    # shading-ready quantity (pbrt folds the same factor)
    return out
