"""Curve geometry + animated vertex caches, TPU-native.

Reference: Scene/Animation/AnimatedVertexCache.h (CachedCurve/CachedMesh:
per-keyframe vertex buffers, linear interpolation between time samples,
looped playback) and UpdateCurvePolyTubeVertices.slang (curve strands
tessellated into poly-tubes on the GPU each frame).

TPU design: topology is FROZEN at import (the reference assumes this too —
"We assume the topology doesn't change during animation",
AnimatedVertexCache.h:57). Each frame only re-evaluates vertex POSITIONS:
keyframe interpolation is one lerp over [T,3,3] device arrays and the
poly-tube re-tessellation is a fixed vectorized map from strand control
points to the triangle soup — both jit-traceable with static shapes, so the
whole-frame graph never retraces across the animation. The per-frame
keyframe bracket (i0, i1, weight) is resolved host-side exactly like
NodeTrack.sample and enters the jit as fresh device constants.
"""
from __future__ import annotations

import numpy as np

from .animation import AnimationController


def curve_frames(points):
    """Per-ring orthonormal frames for strands [S, N, 3] (any array
    namespace). Returns (tangent, normal, binormal) each [S, N, 3].
    Tangents use central differences (ends one-sided); the normal seeds
    from a fixed up vector with an axis fallback — the same frame choice
    every frame, so tube vertices move continuously with the strand."""
    import jax.numpy as jnp
    t = jnp.concatenate([points[:, 1:2] - points[:, 0:1],
                         points[:, 2:] - points[:, :-2],
                         points[:, -1:] - points[:, -2:-1]], axis=1)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    up = jnp.asarray([0.0, 1.0, 0.0])
    alt = jnp.asarray([1.0, 0.0, 0.0])
    seed = jnp.where((jnp.abs(t @ up) > 0.99)[..., None], alt, up)
    n = jnp.cross(t, seed)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    b = jnp.cross(t, n)
    return t, n, b


def poly_tube_mesh(points, radii, sides: int = 4):
    """Tessellate strands into a poly-tube triangle soup
    (UpdateCurvePolyTubeVertices.slang's vertex rule, vectorized).

    points: [S, N, 3] strand control points; radii: [N] or [S, N] per-ring
    radius; sides: ring vertex count. Returns positions [S*(N-1)*sides*2,
    3, 3] — topology depends only on (S, N, sides), so re-tessellating an
    animated strand set reuses the same compiled graph."""
    import jax.numpy as jnp
    points = jnp.asarray(points)
    s, n, _ = points.shape
    radii = jnp.broadcast_to(jnp.asarray(radii, jnp.float32), (s, n))
    _, nrm, bin_ = curve_frames(points)
    ang = jnp.arange(sides, dtype=jnp.float32) / sides * (2.0 * jnp.pi)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # ring vertices [S, N, sides, 3]
    ring = (points[:, :, None, :]
            + radii[..., None, None] * (ca[None, None, :, None]
                                        * nrm[:, :, None, :]
                                        + sa[None, None, :, None]
                                        * bin_[:, :, None, :]))
    a = ring[:, :-1]                                  # [S, N-1, sides, 3]
    b = ring[:, 1:]
    a_n = jnp.roll(a, -1, axis=2)
    b_n = jnp.roll(b, -1, axis=2)
    # two triangles per quad, outward winding
    t1 = jnp.stack([a, b, a_n], axis=3)               # [S, N-1, sides, 3, 3]
    t2 = jnp.stack([a_n, b, b_n], axis=3)
    tris = jnp.concatenate([t1, t2], axis=3)
    return tris.reshape(s * (n - 1) * sides * 2, 3, 3)


def poly_tube_tri_count(s: int, n: int, sides: int = 4) -> int:
    return s * (n - 1) * sides * 2


class _Cache:
    """One cached target: bracketed time sampling shared by mesh and curve
    caches (AnimatedVertexCache::interpolate semantics: linear between
    time samples, looped)."""

    def __init__(self, time_samples, t0: int):
        self.times = np.asarray(time_samples, np.float64)
        self.t0 = int(t0)      # first triangle of the target range
        self.duration = float(self.times[-1]) if len(self.times) > 1 else 1.0

    def bracket(self, time: float):
        if len(self.times) == 1:
            return 0, 0, 0.0
        t = time % self.duration
        i1 = int(np.searchsorted(self.times, t, side="right"))
        i1 = min(max(i1, 1), len(self.times) - 1)
        i0 = i1 - 1
        span = float(self.times[i1] - self.times[i0]) or 1.0
        return i0, i1, float((t - self.times[i0]) / span)


class CachedMeshTrack(_Cache):
    """CachedMesh analogue: per-keyframe triangle-soup positions for a
    contiguous triangle range [t0, t0+T) of the scene
    (AnimatedVertexCache.h:64-72)."""

    def __init__(self, time_samples, t0: int, vertex_data):
        super().__init__(time_samples, t0)
        self.data = np.asarray(vertex_data, np.float32)   # [K, T, 3, 3]
        assert self.data.ndim == 4 and len(self.times) == self.data.shape[0]

    def positions(self, time: float):
        import jax.numpy as jnp
        i0, i1, f = self.bracket(time)
        return (1.0 - f) * jnp.asarray(self.data[i0]) \
            + f * jnp.asarray(self.data[i1])


class CachedCurveTrack(_Cache):
    """CachedCurve analogue: per-keyframe strand control points; the tube
    re-tessellates each frame from the interpolated strands
    (AnimatedVertexCache.h:47-62 + UpdateCurvePolyTubeVertices.slang)."""

    def __init__(self, time_samples, t0: int, strand_data, radii,
                 sides: int = 4):
        super().__init__(time_samples, t0)
        self.data = np.asarray(strand_data, np.float32)   # [K, S, N, 3]
        assert self.data.ndim == 4 and len(self.times) == self.data.shape[0]
        self.radii = np.asarray(radii, np.float32)
        self.sides = int(sides)

    @property
    def tri_count(self) -> int:
        _, s, n, _ = self.data.shape
        return poly_tube_tri_count(s, n, self.sides)

    def positions(self, time: float):
        import jax.numpy as jnp
        i0, i1, f = self.bracket(time)
        pts = (1.0 - f) * jnp.asarray(self.data[i0]) \
            + f * jnp.asarray(self.data[i1])
        return poly_tube_mesh(pts, self.radii, self.sides)


class VertexCacheController(AnimationController):
    """AnimatedVertexCache analogue: drives cached mesh/curve triangle
    ranges of a scene, composing with TRS node tracks for everything else
    (AnimationController owns both in the reference too). Per frame each
    cache's positions replace a STATIC triangle slice of the soup
    (`.at[t0:t0+T].set`), and normals over those ranges are recomputed
    face-aligned from the deformed geometry."""

    def __init__(self, caches, tracks=None, dt: float = 1 / 60):
        super().__init__(tracks or {}, dt=dt)
        self.caches = list(caches)

    def _apply(self, scene, positions, time):
        for cache in self.caches:
            new = cache.positions(time)
            positions = positions.at[cache.t0:cache.t0 + new.shape[0]].set(
                new)
        return positions

    def animate(self, scene, time: float):
        import jax.numpy as jnp
        if self.tracks:
            scene = super().animate(scene, time)
        pos = self._apply(scene, scene.positions, time)
        prev = self._apply(
            scene,
            scene.prev_positions if scene.prev_positions is not None
            else scene.positions,
            max(time - self.dt, 0.0))
        # face-aligned normals over the cached ranges only
        normals = scene.normals
        for cache in self.caches:
            t0 = cache.t0
            t1 = t0 + (cache.tri_count if hasattr(cache, "tri_count")
                       else cache.data.shape[1])
            p = pos[t0:t1]
            fn = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
            fn = fn / jnp.maximum(
                jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-8)
            normals = normals.at[t0:t1].set(
                jnp.broadcast_to(fn[:, None, :], p.shape))
        from ..utils.structs import replace as _replace
        return _replace(scene, positions=pos, normals=normals,
                        prev_positions=prev)
