"""Math helpers mirroring Falcor's Utils/Math (reference Source/Falcor/Utils/Math/)
re-expressed as jnp array ops.

Conventions (fixed across the whole framework):
  * world space: right-handed, +y up.
  * view space: right-handed, camera looks down -z (matches UVToViewSpace in
    reference Source/RenderPasses/SVAO/Common.slang:139-144).
  * uv: origin top-left, y down, in [0,1].
  * clip/NDC: D3D-style, z in [0,1] after perspective divide
    (Falcor runs on D3D12; LinearizeDepth assumes this mapping,
    reference Source/RenderPasses/LinearizeDepth/Linearize.ps.slang).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v, axis=-1, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps))


def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    return a + (b - a) * t


def look_at(eye, target, up):
    """Right-handed view matrix; view space looks down -z. 4x4 float32."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = normalize(target - eye)          # forward
    s = normalize(jnp.cross(f, up))      # right
    u = jnp.cross(s, f)                  # true up
    m = jnp.stack([
        jnp.concatenate([s, jnp.array([-jnp.dot(s, eye)])]),
        jnp.concatenate([u, jnp.array([-jnp.dot(u, eye)])]),
        jnp.concatenate([-f, jnp.array([jnp.dot(f, eye)])]),
        jnp.array([0.0, 0.0, 0.0, 1.0]),
    ]).astype(jnp.float32)
    return m


def perspective(fov_y, aspect, near, far):
    """Right-handed perspective, depth mapped to [0,1] (D3D / perspectiveRH_ZO).

    view z=-near -> ndc z=0, view z=-far -> ndc z=1, so the non-linear depth d
    satisfies `near*far / (far + d*(near-far)) == viewZ` — exactly the formula
    LinearizeDepth inverts (reference LinearizeDepth/Linearize.ps.slang:14).
    """
    f = 1.0 / jnp.tan(fov_y * 0.5)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set(far / (near - far))
    m = m.at[2, 3].set(near * far / (near - far))
    m = m.at[3, 2].set(-1.0)
    return m


def transform_point(m, p):
    """Apply 4x4 matrix to 3d point(s) [..., 3] -> [..., 4] homogeneous."""
    p4 = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
    return p4 @ m.T


def transform_vector(m, v):
    """Apply upper-left 3x3 of a 4x4 (or a 3x3) matrix to vector(s) [..., 3]."""
    return v @ m[:3, :3].T


def inverse(m):
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# Octahedral normal packing (ref Utils/Math/PackedFormats — decodeNormal2x8 is
# used by SVAO's loadNormal, reference SVAO/Common.slang:98-103, and
# encodeNormal2x16 by the SD-map normals path, StochasticDepthMapRT Common.slangh:201).
# ---------------------------------------------------------------------------

def _oct_wrap(v):
    return (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)


def ndir_to_oct_snorm(n):
    """Unit vector [...,3] -> octahedral [-1,1]^2."""
    p = n[..., :2] * (1.0 / (jnp.abs(n[..., 0:1]) + jnp.abs(n[..., 1:2]) + jnp.abs(n[..., 2:3])))
    return jnp.where(n[..., 2:3] < 0.0, _oct_wrap(p), p)


def oct_snorm_to_ndir(p):
    """Octahedral [-1,1]^2 -> unit vector [...,3]."""
    z = 1.0 - jnp.abs(p[..., 0]) - jnp.abs(p[..., 1])
    xy = p
    xy = jnp.where(z[..., None] < 0.0, _oct_wrap(p), p)
    n = jnp.concatenate([xy, z[..., None]], axis=-1)
    return normalize(n)


def encode_normal_2x8(n):
    """Pack unit normal into uint32 with 2x8 bits (ref PackedFormats encodeNormal2x8)."""
    p = ndir_to_oct_snorm(n)
    u = jnp.round((p * 0.5 + 0.5) * 255.0).astype(jnp.uint32)
    return u[..., 0] | (u[..., 1] << 8)


def decode_normal_2x8(packed):
    packed = packed.astype(jnp.uint32)
    x = (packed & 0xFF).astype(jnp.float32) / 255.0 * 2.0 - 1.0
    y = ((packed >> 8) & 0xFF).astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return oct_snorm_to_ndir(jnp.stack([x, y], axis=-1))


def encode_normal_2x16(n):
    p = ndir_to_oct_snorm(n)
    u = jnp.round((p * 0.5 + 0.5) * 65535.0).astype(jnp.uint32)
    return u[..., 0] | (u[..., 1] << 16)


def decode_normal_2x16(packed):
    packed = packed.astype(jnp.uint32)
    x = (packed & 0xFFFF).astype(jnp.float32) / 65535.0 * 2.0 - 1.0
    y = ((packed >> 16) & 0xFFFF).astype(jnp.float32) / 65535.0 * 2.0 - 1.0
    return oct_snorm_to_ndir(jnp.stack([x, y], axis=-1))


# ---------------------------------------------------------------------------
# Color helpers (ref Utils/Color/ColorHelpers.slang — used by TAA's YCgCo
# variance clipping, reference TAA/TAA.ps.slang:100-146).
# ---------------------------------------------------------------------------

def rgb_to_ycgco(c):
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    y = 0.25 * r + 0.5 * g + 0.25 * b
    cg = -0.25 * r + 0.5 * g - 0.25 * b
    co = 0.5 * r - 0.5 * b
    return jnp.stack([y, cg, co], axis=-1)


def ycgco_to_rgb(c):
    y, cg, co = c[..., 0], c[..., 1], c[..., 2]
    tmp = y - cg
    r = tmp + co
    g = y + cg
    b = tmp - co
    return jnp.stack([r, g, b], axis=-1)


def luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


# ---------------------------------------------------------------------------
# Hashes from "Improved Alpha Testing Using Hashed Sampling" — used for the
# SD-map reservoir rng (reference StochasticDepthMapRT/Common.slangh:36-51).
# ---------------------------------------------------------------------------

def hash2(v):
    """v: [...,2] float -> [0,1) float (ref Common.slangh:37)."""
    x, y = v[..., 0], v[..., 1]
    return jnp.mod(1.0e4 * jnp.sin(17.0 * x + 0.1 * y) * (0.1 + jnp.abs(jnp.sin(13.0 * y + x))), 1.0)


def hash3(v):
    return hash2(jnp.stack([hash2(v[..., :2]), v[..., 2]], axis=-1))


def hash4(v):
    return hash2(jnp.stack([hash3(v[..., :3]), v[..., 3]], axis=-1))
