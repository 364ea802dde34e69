"""Iso-surface meshing of SDF grids (host-side, import time).

The reference renders SDFGrid geometry through dedicated DXR intersection
shaders (Scene/SDFs/*, sphere-traced in the BLAS). The TPU ray/raster path
is triangle-native, so SDF grid INSTANCES placed by .pyscene scenes are
meshed once at import via marching tetrahedra (each grid cell splits into
6 tets; per tet the zero crossing emits 1-2 triangles with edge
interpolation) — watertight on shared faces and fully vectorized numpy.
The analytic/ray-marched SDF path (scene/sdf.py, SDFEditor pass) remains
for editor-style rendering; this module is the scene-build bridge.
"""
from __future__ import annotations

import numpy as np

# 6 tetrahedra per cube around the 0-7 diagonal, as corner indices of the
# cube's 8 corners (corner i = (x + (i&1), y + (i>>1&1), z + (i>>2&1)))
_TETS = np.asarray([
    [0, 1, 3, 7],
    [0, 3, 2, 7],
    [0, 2, 6, 7],
    [0, 6, 4, 7],
    [0, 4, 5, 7],
    [0, 5, 1, 7],
], np.int32)


def marching_tetrahedra(grid: np.ndarray, bmin, bmax) -> np.ndarray:
    """grid: [N,N,N] signed distances sampled at cell corners over the AABB
    [bmin, bmax] (index order [ix, iy, iz]); returns [T,3,3] triangles."""
    grid = np.asarray(grid, np.float32)
    n = grid.shape[0]
    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    step = (bmax - bmin) / (n - 1)

    ix, iy, iz = np.meshgrid(np.arange(n - 1), np.arange(n - 1),
                             np.arange(n - 1), indexing="ij")
    base = np.stack([ix, iy, iz], -1).reshape(-1, 3)          # [C,3]
    # the 8 cube-corner offsets in (x,y,z)
    corn = np.asarray([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                       for i in range(8)], np.int32)           # [8,3]
    cidx = base[:, None, :] + corn[None]                       # [C,8,3]
    vals = grid[cidx[..., 0], cidx[..., 1], cidx[..., 2]]      # [C,8]
    pos = bmin + cidx.astype(np.float32) * step                # [C,8,3]

    tris = []
    for tet in _TETS:
        v = vals[:, tet]                                       # [C,4]
        p = pos[:, tet]                                        # [C,4,3]
        inside = v < 0.0
        code = (inside[:, 0].astype(np.int32)
                | (inside[:, 1] << 1) | (inside[:, 2] << 2)
                | (inside[:, 3] << 3))

        def edge(a, b):
            da, db = v[:, a], v[:, b]
            t = da / np.where(np.abs(da - db) < 1e-12, 1e-12, da - db)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return p[:, a] * (1 - t) + p[:, b] * t

        # 16 cases: one vertex in (4 cases x 1 tri), two in (3 pair-cases x
        # 2 tris), mirrored for three-in; orientation fixed afterwards
        for one in range(4):
            rest = [i for i in range(4) if i != one]
            for c, flip in ((1 << one, False),
                            (0xF ^ (1 << one), True)):
                m = code == c
                if not m.any():
                    continue
                e = [edge(one, r)[m] for r in rest]
                tri = np.stack([e[0], e[1], e[2]], 1)
                if flip:
                    tri = tri[:, ::-1]
                tris.append(tri)
        pairs = [((0, 1), (2, 3)), ((0, 2), (1, 3)), ((0, 3), (1, 2))]
        for (a, b), (c2, d2) in pairs:
            for cc, flip in (((1 << a) | (1 << b), False),
                             (0xF ^ ((1 << a) | (1 << b)), True)):
                m = code == cc
                if not m.any():
                    continue
                # quad: edges a-c2, a-d2, b-d2, b-c2
                q0 = edge(a, c2)[m]
                q1 = edge(a, d2)[m]
                q2 = edge(b, d2)[m]
                q3 = edge(b, c2)[m]
                t1 = np.stack([q0, q1, q2], 1)
                t2 = np.stack([q0, q2, q3], 1)
                if flip:
                    t1 = t1[:, ::-1]
                    t2 = t2[:, ::-1]
                tris.append(t1)
                tris.append(t2)
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    out = np.concatenate(tris, 0).astype(np.float32)

    # fix orientation globally: normals should point OUT of the negative
    # (inside) region — flip triangles whose normal disagrees with the
    # local SDF gradient at the triangle centroid
    cent = out.mean(1)
    nrm = np.cross(out[:, 1] - out[:, 0], out[:, 2] - out[:, 0])
    gi = np.clip(((cent - bmin) / step).astype(np.int32), 0, n - 2)

    def g_axis(axis):
        up = gi.copy()
        up[:, axis] += 1
        return (grid[up[:, 0], up[:, 1], up[:, 2]]
                - grid[gi[:, 0], gi[:, 1], gi[:, 2]])
    grad = np.stack([g_axis(0), g_axis(1), g_axis(2)], -1)
    flip = np.sum(nrm * grad, -1) < 0.0
    out[flip] = out[flip][:, ::-1]
    return out
