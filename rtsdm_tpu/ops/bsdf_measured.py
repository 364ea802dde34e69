"""Measured and PBRT material families: MERL tables + PBRT closed forms.

Reference surfaces:
- MERLMaterial: Source/Falcor/Rendering/Materials/MERLMaterial.slang:1 and
  Scene/Material/MERLMaterial.cpp (loads a MERL 100 isotropic BRDF .binary,
  evaluates it by the Rusinkiewicz half/difference-angle parameterization).
- PBRT materials: Source/Falcor/Rendering/Materials/PBRT/
  PBRTDiffuseMaterialInstance.slang (Lambert over albedo/pi),
  PBRTConductorMaterialInstance.slang (Trowbridge-Reitz microfacet with
  complex-IOR conductor Fresnel), PBRTDielectricMaterialInstance.slang
  (rough dielectric; the reflection lobe is implemented here, transmission
  is out of scope for the opaque viewer — documented).

TPU design notes: everything is dense vectorized math over [H,W] fields.
The MERL table fetch is ONE per-pixel lookup into a [90*90*180, 3] table —
4.37M rows is far beyond the one-hot-MXU pattern (ops/materials.py), so it
stays an XLA gather and is therefore a VIEWER-tier op (BSDFViewer / quality
oracles), not a hot-path op. That mirrors the reference, where MERL
materials are debug/comparison assets, not used by the AO pipeline.
"""
from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..utils.math import normalize, saturate

_PI = 3.14159265358979

# MERL binary layout constants (Matusik et al. 2003 database format)
MERL_THETA_H = 90
MERL_THETA_D = 90
MERL_PHI_D = 180
MERL_SCALE = (1.0 / 1500.0, 1.15 / 1500.0, 1.66 / 1500.0)


def load_merl(path):
    """Parse a MERL .binary BRDF file -> float32 table
    [THETA_H, THETA_D, PHI_D, 3], channel-scaled (MERLMaterial.cpp load)."""
    with open(path, "rb") as f:
        dims = struct.unpack("<3i", f.read(12))
        n = dims[0] * dims[1] * dims[2]
        if (dims[0], dims[1], dims[2]) != (MERL_THETA_H, MERL_THETA_D,
                                           MERL_PHI_D):
            raise ValueError(f"not a MERL isotropic BRDF file: dims={dims}")
        raw = np.frombuffer(f.read(n * 3 * 8), dtype="<f8", count=n * 3)
    tab = raw.reshape(3, MERL_THETA_H, MERL_THETA_D, MERL_PHI_D)
    tab = np.moveaxis(tab, 0, -1).astype(np.float32)
    tab = np.maximum(tab, 0.0) * np.asarray(MERL_SCALE, np.float32)
    return jnp.asarray(tab)


def save_merl(path, table):
    """Inverse of load_merl (test fixture writer)."""
    tab = np.asarray(table, np.float64) / np.asarray(MERL_SCALE)
    tab = np.moveaxis(tab, -1, 0)
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", MERL_THETA_H, MERL_THETA_D, MERL_PHI_D))
        f.write(tab.astype("<f8").tobytes())


def synthetic_merl(base=(0.2, 0.1, 0.05), spec=0.8, shininess=40.0):
    """Procedural stand-in table (no MERL assets ship in this environment):
    diffuse base + a theta_h specular ridge — enough structure to exercise
    the parameterization and lookup paths."""
    th = (np.arange(MERL_THETA_H) / MERL_THETA_H) ** 2 * (np.pi / 2)
    ridge = np.exp(-shininess * th ** 2)[:, None, None, None]
    tab = (np.asarray(base, np.float32)[None, None, None, :]
           / np.pi + spec * ridge.astype(np.float32))
    return jnp.asarray(np.broadcast_to(
        tab, (MERL_THETA_H, MERL_THETA_D, MERL_PHI_D, 3)).copy())


def _rotate(v, axis, ang):
    """Rodrigues rotation of v about unit axis by ang (all broadcastable)."""
    c = jnp.cos(ang)[..., None]
    s = jnp.sin(ang)[..., None]
    d = jnp.sum(axis * v, -1, keepdims=True)
    return v * c + jnp.cross(axis, v) * s + axis * d * (1.0 - c)


def merl_half_diff(n, wo, wi):
    """Rusinkiewicz (theta_h, theta_d, phi_d) of a direction pair in the
    local frame of n (MERLMaterial.slang std_coords / the database's
    half/diff convention). Returns angles in radians."""
    # deterministic tangent frame from n
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                   jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t = normalize(jnp.cross(up, n) + 1e-12)
    b = jnp.cross(n, t)

    def local(wv):
        return jnp.stack([jnp.sum(wv * t, -1), jnp.sum(wv * b, -1),
                          jnp.sum(wv * n, -1)], -1)

    wo_l, wi_l = local(wo), local(wi)
    h = normalize(wo_l + wi_l + 1e-12)
    theta_h = jnp.arccos(jnp.clip(h[..., 2], -1.0, 1.0))
    phi_h = jnp.arctan2(h[..., 1], h[..., 0])
    z = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), h.shape)
    y = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), h.shape)
    tmp = _rotate(wi_l, z, -phi_h)
    wd = _rotate(tmp, y, -theta_h)
    theta_d = jnp.arccos(jnp.clip(wd[..., 2], -1.0, 1.0))
    phi_d = jnp.arctan2(wd[..., 1], wd[..., 0])
    # reciprocity fold: phi_d in [0, pi)
    phi_d = jnp.where(phi_d < 0.0, phi_d + _PI, phi_d)
    return theta_h, theta_d, phi_d


def merl_indices(theta_h, theta_d, phi_d):
    """Database bin indices (Matusik's lookup, MERLMaterial.slang:95-120):
    theta_h uses the sqrt warp that concentrates bins near normal."""
    ih = jnp.clip((jnp.sqrt(jnp.maximum(theta_h / (_PI / 2.0), 0.0))
                   * MERL_THETA_H).astype(jnp.int32), 0, MERL_THETA_H - 1)
    id_ = jnp.clip((theta_d / (_PI / 2.0)
                    * MERL_THETA_D).astype(jnp.int32), 0, MERL_THETA_D - 1)
    ip = jnp.clip((phi_d / _PI
                   * MERL_PHI_D).astype(jnp.int32), 0, MERL_PHI_D - 1)
    return ih, id_, ip


def eval_merl(table, n, wo, wi):
    """f(wo, wi) * cos(theta_i) from a MERL table (viewer-tier: one XLA
    gather per pixel — see module docstring)."""
    th, td, pd = merl_half_diff(n, wo, wi)
    ih, id_, ip = merl_indices(th, td, pd)
    flat = (ih * MERL_THETA_D + id_) * MERL_PHI_D + ip
    vals = jnp.take(table.reshape(-1, 3), flat, axis=0)
    n_dot_i = saturate(jnp.sum(n * wi, -1))
    n_dot_o = jnp.sum(n * wo, -1)
    vis = ((n_dot_i > 0.0) & (n_dot_o > 0.0)).astype(jnp.float32)
    return vals * (n_dot_i * vis)[..., None]


# ---------------------------------------------------------------------------
# PBRT closed forms
# ---------------------------------------------------------------------------

def eval_pbrt_diffuse(albedo, n, wo, wi):
    """PBRTDiffuseMaterialInstance.slang: f = albedo / pi (times cos)."""
    n_dot_i = saturate(jnp.sum(n * wi, -1))
    n_dot_o = jnp.sum(n * wo, -1)
    vis = ((n_dot_i > 0.0) & (n_dot_o > 0.0)).astype(jnp.float32)
    return albedo / _PI * (n_dot_i * vis)[..., None]


def fresnel_conductor(cos_i, eta, k):
    """Exact conductor Fresnel reflectance for complex IOR eta - i*k
    (pbrt FrComplex; per channel, unpolarized average)."""
    c = jnp.clip(cos_i, 1e-4, 1.0)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2, k2 = eta * eta, k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / (t1 + t2)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / (t3 + t4)
    return 0.5 * (rs + rp)


def fresnel_dielectric(cos_i, eta):
    """Exact dielectric Fresnel (pbrt FrDielectric), scalar eta."""
    c = jnp.clip(cos_i, 1e-4, 1.0)
    s2 = (1.0 - c * c) / (eta * eta)
    ct = jnp.sqrt(jnp.maximum(1.0 - s2, 0.0))
    r_par = (eta * c - ct) / (eta * c + ct)
    r_perp = (c - eta * ct) / (c + eta * ct)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(s2 >= 1.0, 1.0, f)  # TIR


def _microfacet_common(rough, n, wo, wi):
    from .brdf import ggx_d, smith_g
    h = normalize(wo + wi + 1e-12)
    n_dot_i = saturate(jnp.sum(n * wi, -1))
    n_dot_o = saturate(jnp.sum(n * wo, -1))
    n_dot_h = saturate(jnp.sum(n * h, -1))
    o_dot_h = saturate(jnp.sum(wo * h, -1))
    alpha = jnp.maximum(rough * rough, 1e-4)
    d = ggx_d(n_dot_h, alpha)
    g = smith_g(jnp.maximum(n_dot_o, 1e-4), jnp.maximum(n_dot_i, 1e-4),
                alpha)
    spec = d * g / jnp.maximum(4.0 * n_dot_o * n_dot_i, 1e-6)
    vis = ((n_dot_i > 0.0) & (n_dot_o > 0.0)).astype(jnp.float32)
    return spec, o_dot_h, n_dot_i, vis


def eval_pbrt_conductor(eta, k, rough, n, wo, wi):
    """PBRTConductorMaterialInstance.slang: Trowbridge-Reitz microfacet
    with exact complex Fresnel. eta/k: [..., 3] spectral complex IOR."""
    spec, o_dot_h, n_dot_i, vis = _microfacet_common(rough, n, wo, wi)
    f = fresnel_conductor(o_dot_h, eta, k)
    return f * (spec * n_dot_i * vis)[..., None]


def eval_pbrt_dielectric(ior, rough, n, wo, wi):
    """PBRTDielectricMaterialInstance.slang, reflection lobe only (the
    transmission lobe needs refracted geometry the opaque viewer does not
    model — deliberate bound, documented)."""
    spec, o_dot_h, n_dot_i, vis = _microfacet_common(rough, n, wo, wi)
    f = fresnel_dielectric(o_dot_h, float(ior))
    r = f * spec * n_dot_i * vis
    return jnp.stack([r, r, r], -1)
