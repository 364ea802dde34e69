"""Shared StandardMaterial-equivalent BSDF math (diffuse + GGX specular,
metallic workflow).

This is the single BSDF evaluation core used by BOTH the path tracer and
the raster graph shading (Forward/Deferred), mirroring how the reference
routes every shading path through the StandardMaterial instance
(reference Source/Falcor/Scene/Material/StandardMaterial.h:68,
Rendering/Materials/StandardMaterialInstance.slang eval/sample;
the lobes are the isotropic GGX + Lambert pair of
Rendering/Materials/BxDF.slang).

Conventions: all directions unit length, wo points AWAY from the surface
toward the viewer, wi toward the light. Evaluations return f*cos terms.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import normalize, saturate

PI = 3.14159265


def ggx_d(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * d * d, 1e-8)


def smith_g(n_dot_v, n_dot_l, alpha):
    def g1(c):
        a2 = alpha * alpha
        return 2.0 * c / jnp.maximum(
            c + jnp.sqrt(a2 + (1.0 - a2) * c * c), 1e-8)
    return g1(jnp.maximum(n_dot_v, 1e-4)) * g1(jnp.maximum(n_dot_l, 1e-4))


def fresnel_schlick(v_dot_h, f0=0.04, f90=1.0):
    return f0 + (f90 - f0) * (1.0 - saturate(v_dot_h)) ** 5


def ior_to_f0(ior):
    """Dielectric normal-incidence reflectance from the index of refraction
    (StandardMaterial IoR parameter, Scene/Material/MaterialData.slang)."""
    r = (ior - 1.0) / jnp.maximum(ior + 1.0, 1e-4)
    return r * r


def metallic_albedos(base_color, metallic, ior):
    """(diffuse albedo, specular F0) under the metallic workflow
    (Scene/Material/StandardMaterial shading model: metals tint the
    specular lobe with base color and kill the diffuse lobe)."""
    m = metallic[..., None] if metallic.ndim < base_color.ndim else metallic
    f0d = ior_to_f0(ior)
    f0d = f0d[..., None] if f0d.ndim < base_color.ndim else f0d
    diff = base_color * (1.0 - m)
    f0 = f0d * (1.0 - m) + base_color * m
    return diff, f0


def eval_lobes(diff_albedo, f0, rough, n, wo, wi):
    """f*cos of the diffuse+GGX pair for one light direction.
    Shapes: [...,3] colors, [...] scalars, [...,3] vectors."""
    n_dot_l = jnp.sum(n * wi, -1)
    n_dot_v = jnp.maximum(jnp.sum(n * wo, -1), 1e-4)
    h = normalize(wo + wi)
    n_dot_h = saturate(jnp.sum(n * h, -1))
    v_dot_h = saturate(jnp.sum(wo * h, -1))
    alpha = jnp.maximum(rough * rough, 1e-3)
    valid = n_dot_l > 1e-5
    f = fresnel_schlick(v_dot_h[..., None], f0)
    d = ggx_d(n_dot_h, alpha)
    g = smith_g(n_dot_v, n_dot_l, alpha)
    spec = f * (d * g / jnp.maximum(4.0 * n_dot_v * n_dot_l, 1e-6))[..., None]
    diff = diff_albedo / PI
    return jnp.where(valid[..., None], (diff + spec) * n_dot_l[..., None], 0.0)
