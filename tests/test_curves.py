"""Curve poly-tube tessellation + animated vertex caches
(reference Scene/Animation/AnimatedVertexCache.h, CachedCurve/CachedMesh)."""
import numpy as np
import jax.numpy as jnp

from rtsdm_tpu.scene.curves import (CachedCurveTrack, CachedMeshTrack,
                                    VertexCacheController, poly_tube_mesh,
                                    poly_tube_tri_count)
from rtsdm_tpu.scene.procedural import cornell_box


def test_poly_tube_topology_and_radius():
    s, n, sides = 3, 5, 6
    pts = np.zeros((s, n, 3), np.float32)
    pts[..., 1] = np.arange(n)[None, :]           # straight vertical strands
    pts[..., 0] = np.arange(s)[:, None] * 3.0     # spaced apart
    tris = np.asarray(poly_tube_mesh(jnp.asarray(pts), 0.05, sides))
    assert tris.shape == (poly_tube_tri_count(s, n, sides), 3, 3)
    assert np.isfinite(tris).all()
    # rings 1 apart, radius 0.05: every tube vertex's NEAREST ring center
    # is its own, at exactly the radius
    centers = pts.reshape(-1, 3)
    v = tris.reshape(-1, 3)
    d = np.linalg.norm(v[:, None, :] - centers[None, :, :], axis=-1)
    assert np.allclose(d.min(axis=1), 0.05, atol=1e-5)


def test_cached_mesh_track_interpolates():
    k0 = np.zeros((4, 3, 3), np.float32)
    k1 = np.ones((4, 3, 3), np.float32)
    tr = CachedMeshTrack([0.0, 1.0], t0=0, vertex_data=[k0, k1])
    assert np.allclose(np.asarray(tr.positions(0.0)), 0.0)
    assert np.allclose(np.asarray(tr.positions(0.5)), 0.5)
    # looped playback (AnimatedVertexCache: looped by default)
    assert np.allclose(np.asarray(tr.positions(1.25)), 0.25)


def test_vertex_cache_controller_animates_range():
    scene = cornell_box()
    t = int(scene.positions.shape[0])
    base = np.asarray(scene.positions)
    k0 = base[:4]
    k1 = base[:4] + np.float32(0.25)
    ctrl = VertexCacheController(
        [CachedMeshTrack([0.0, 1.0], t0=0, vertex_data=[k0, k1])])
    out = ctrl.animate(scene, 0.5)
    pos = np.asarray(out.positions)
    assert np.allclose(pos[:4], k0 + 0.125, atol=1e-6)
    assert np.allclose(pos[4:], base[4:])         # rest untouched
    # prev positions trail by dt
    prev = np.asarray(out.prev_positions)
    assert prev[:4].mean() < pos[:4].mean()
    # normals over the cached range stay unit length
    nrm = np.asarray(out.normals[:4])
    assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)


def test_cached_curve_track_retessellates():
    s, n, sides = 2, 4, 4
    base = np.zeros((s, n, 3), np.float32)
    base[..., 1] = np.arange(n)[None, :]
    moved = base.copy()
    moved[..., 0] += 1.0
    tr = CachedCurveTrack([0.0, 2.0], t0=0, strand_data=[base, moved],
                          radii=0.1, sides=sides)
    assert tr.tri_count == poly_tube_tri_count(s, n, sides)
    p0 = np.asarray(tr.positions(0.0))
    p1 = np.asarray(tr.positions(2.0 - 1e-6))
    assert p0.shape == (tr.tri_count, 3, 3)
    # the tube moved with the strands: +1 in x at the far keyframe
    assert np.allclose(p1[..., 0] - p0[..., 0], 1.0, atol=1e-3)
