"""TPU-native ray tracing over flattened triangle soups.

Replaces DXR TraceRay / RayQuery (reference Scene::raytrace Scene.cpp:388-406,
inline queries SVAORaster2.ps.slang:9-46, RayShadow.ps.slang:131-186).

Design: rays are a flat [R] batch; triangles are processed in static-size
chunks under `lax.scan` with Möller-Trumbore evaluated [R, CHUNK]-wide and
immediately reduced — XLA fuses the intersection math into the reduction so
the [R, CHUNK] tensor never materializes in HBM. This is the brute-force
tier; an LBVH tier (sorted morton ranges as chunks with early interval
rejection) plugs into the same reducers.

Front-face convention: det = dot(e1, cross(dir, e2)) > 0 <=> geometric normal
faces the ray origin (matches DXR CandidateTriangleFrontFace for CCW winding).

Reservoir/any-hit semantics for stochastic depth maps are implemented as
merge-based bottom-k selection (see sd_trace): statistically equivalent to
the reference's streaming reservoir insertion (StochasticDepthMapRT/
Common.slangh:137-151) — both draw a uniform k-subset of all hits — but
expressible as a vectorized top_k instead of a sequential insert.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 256

CULL_NONE = 0
CULL_BACK = 1


def _pad_tris(positions, chunk):
    t = positions.shape[0]
    pad = (-t) % chunk
    if pad:
        # degenerate padding triangles never hit
        positions = jnp.concatenate(
            [positions, jnp.zeros((pad, 3, 3), positions.dtype)], axis=0)
    return positions, (t + pad) // chunk


def _mt_intersect(origins, dirs, v0, e1, e2, cull):
    """Möller-Trumbore, broadcast [R,1,3] x [1,K,3] -> [R,K] hits.

    Returns (t, valid, front, bary_uv)."""
    o = origins[:, None, :]
    d = dirs[:, None, :]
    pvec = jnp.cross(d, e2[None, :, :])
    det = jnp.sum(e1[None] * pvec, -1)
    eps = 1e-9
    if cull == CULL_BACK:
        ok = det > eps
    else:
        ok = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, 1.0, det)
    tvec = o - v0[None]
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1[None])
    v = jnp.sum(d * qvec, -1) * inv_det
    t = jnp.sum(e2[None] * qvec, -1) * inv_det
    valid = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, valid, det > 0.0, (u, v)


@functools.partial(jax.jit, static_argnames=("chunk", "cull"))
def any_hit(scene, origins, dirs, tmin, tmax, chunk: int = DEFAULT_CHUNK,
            cull: int = CULL_NONE):
    """True where any triangle intersects (tmin, tmax). Shadow-ray kernel
    (RayShadow.ps.slang traceShadowRay)."""
    tris, n_chunks = _pad_tris(scene.positions, chunk)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]

    def body(hit, idx):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        t, valid, _, _ = _mt_intersect(origins, dirs, sl(v0), sl(e1), sl(e2), cull)
        h = jnp.any(valid & (t > tmin[:, None]) & (t < tmax[:, None]), axis=1)
        return hit | h, None

    hit0 = jnp.zeros(origins.shape[0], bool)
    hit, _ = jax.lax.scan(body, hit0, jnp.arange(n_chunks))
    return hit


@functools.partial(jax.jit, static_argnames=("chunk", "cull"))
def closest_hit(scene, origins, dirs, tmin, tmax, chunk: int = DEFAULT_CHUNK,
                cull: int = CULL_NONE):
    """Nearest intersection: returns (t, tri_id) with t=tmax & id=-1 on miss."""
    tris, n_chunks = _pad_tris(scene.positions, chunk)
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]

    def body(carry, idx):
        best_t, best_id = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk)
        t, valid, _, _ = _mt_intersect(origins, dirs, sl(v0), sl(e1), sl(e2), cull)
        t = jnp.where(valid & (t > tmin[:, None]) & (t < tmax[:, None]), t, jnp.inf)
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        better = tk < best_t
        best_id = jnp.where(better, idx * chunk + k, best_id)
        best_t = jnp.where(better, tk, best_t)
        return (best_t, best_id), None

    r = origins.shape[0]
    init = (jnp.full((r,), jnp.inf), jnp.full((r,), -1, jnp.int32))
    (t, tid), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return jnp.where(tid >= 0, t, tmax), tid
