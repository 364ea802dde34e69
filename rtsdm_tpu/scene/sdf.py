"""SDF geometry (reference Source/Falcor/Scene/SDFs/ — SDF grid primitives
with dense/sparse voxel backends, plus the SDFEditor pass's edit model).

TPU-native design: a primitive list is a flat SoA table (type, transform,
params, operator, smoothing) evaluated vectorized over point batches — the
analytic path. For large primitive counts the list is BAKED into a dense
distance grid [N,N,N] (the reference's NormalizedDenseSDFGrid) and evaluated
by trilinear interpolation: 8 gathers per point, done once per marching
step over the full pixel batch (SDF rendering is not the AO hot path).
Sphere tracing is a fixed-iteration `lax.fori_loop` — no data-dependent
control flow under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# primitive types (ref SDF3DPrimitive::Type, Scene/SDFs/SDF3DPrimitive.slang)
PRIM_SPHERE = 0
PRIM_BOX = 1
PRIM_TORUS = 2
PRIM_CAPSULE = 3

# combine operators (ref SDFOperationType)
OP_UNION = 0
OP_SUBTRACT = 1
OP_INTERSECT = 2
OP_SMOOTH_UNION = 3


class SDFPrimitiveList:
    """Editable primitive list (the SDFEditor's data model,
    reference Source/RenderPasses/SDFEditor/SDFEditor.cpp: primitive
    add/remove/transform edits batched onto the grid)."""

    def __init__(self):
        self._prims: list[dict] = []

    # -- editor API ---------------------------------------------------------
    def add(self, kind: int, position, params, rotation_y: float = 0.0,
            op: int = OP_UNION, smoothing: float = 0.0) -> int:
        """Add a primitive; returns its id. `params` meaning per kind:
        sphere (r,)  box (hx,hy,hz)  torus (R, r)  capsule (half_len, r)."""
        self._prims.append(dict(kind=int(kind),
                                position=np.asarray(position, np.float32),
                                params=np.asarray(params, np.float32),
                                rot_y=float(rotation_y), op=int(op),
                                smoothing=float(smoothing)))
        return len(self._prims) - 1

    def remove(self, pid: int):
        self._prims.pop(pid)

    def move(self, pid: int, position):
        self._prims[pid]["position"] = np.asarray(position, np.float32)

    def __len__(self):
        return len(self._prims)

    def to_dict(self) -> dict:
        """Serialization (ref SDFEditor save: grid .sdfg files)."""
        return {"primitives": [
            dict(kind=p["kind"], position=p["position"].tolist(),
                 params=p["params"].tolist(), rot_y=p["rot_y"], op=p["op"],
                 smoothing=p["smoothing"]) for p in self._prims]}

    @staticmethod
    def from_dict(d: dict) -> "SDFPrimitiveList":
        pl = SDFPrimitiveList()
        for p in d.get("primitives", []):
            pl.add(p["kind"], p["position"], p["params"], p.get("rot_y", 0.0),
                   p.get("op", OP_UNION), p.get("smoothing", 0.0))
        return pl

    # -- device tables ------------------------------------------------------
    def tables(self):
        """SoA arrays for vectorized eval: (kind[P], pos[P,3], prm[P,3],
        rot[P], op[P], smooth[P])."""
        n = max(len(self._prims), 1)
        kind = np.zeros(n, np.int32)
        pos = np.zeros((n, 3), np.float32)
        prm = np.zeros((n, 3), np.float32)
        rot = np.zeros(n, np.float32)
        op = np.zeros(n, np.int32)
        sm = np.zeros(n, np.float32)
        if not self._prims:
            prm[0] = (-1.0, 0, 0)  # empty list: a sphere of negative radius
        for i, p in enumerate(self._prims):
            kind[i] = p["kind"]
            pos[i] = p["position"]
            prm[i, :len(p["params"])] = p["params"]
            rot[i] = p["rot_y"]
            op[i] = p["op"]
            sm[i] = p["smoothing"]
        return tuple(jnp.asarray(a) for a in (kind, pos, prm, rot, op, sm))


def _prim_distance(kind, local, prm):
    """Distance of local-frame points [..., 3] to one primitive.
    Branchless select over the primitive kinds (SDF3DPrimitive.slang)."""
    x, y, z = local[..., 0], local[..., 1], local[..., 2]
    r = jnp.linalg.norm(local, axis=-1)
    d_sphere = r - prm[0]
    q = jnp.abs(local) - prm
    d_box = (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
             + jnp.minimum(jnp.max(q, axis=-1), 0.0))
    ring = jnp.sqrt(x * x + z * z) - prm[0]
    d_torus = jnp.sqrt(ring * ring + y * y) - prm[1]
    yc = y - jnp.clip(y, -prm[0], prm[0])
    d_capsule = jnp.sqrt(x * x + yc * yc + z * z) - prm[1]
    return jnp.select([kind == PRIM_SPHERE, kind == PRIM_BOX,
                       kind == PRIM_TORUS, kind == PRIM_CAPSULE],
                      [d_sphere, d_box, d_torus, d_capsule], d_sphere)


def eval_sdf(tables, p):
    """Evaluate the combined SDF at points [..., 3] -> [...].

    Sequential fold over primitives in list order (edit order matters for
    subtract, as in the editor); `lax.scan` keeps it compiled-size-constant
    for long edit histories."""
    kind, pos, prm, rot, op, sm = tables

    def fold(d, i):
        c, s = jnp.cos(rot[i]), jnp.sin(rot[i])
        rel = p - pos[i]
        local = jnp.stack([c * rel[..., 0] - s * rel[..., 2], rel[..., 1],
                           s * rel[..., 0] + c * rel[..., 2]], -1)
        di = _prim_distance(kind[i], local, prm[i])
        k = jnp.maximum(sm[i], 1e-6)
        h = jnp.clip(0.5 + 0.5 * (d - di) / k, 0.0, 1.0)
        smooth = d + (di - d) * h - k * h * (1.0 - h)
        d_next = jnp.select(
            [op[i] == OP_UNION, op[i] == OP_SUBTRACT, op[i] == OP_INTERSECT,
             op[i] == OP_SMOOTH_UNION],
            [jnp.minimum(d, di), jnp.maximum(d, -di), jnp.maximum(d, di),
             smooth], jnp.minimum(d, di))
        return d_next, None

    d0 = jnp.full(p.shape[:-1], 1e9, jnp.float32)
    d, _ = jax.lax.scan(fold, d0, jnp.arange(kind.shape[0]))
    return d


# ---------------------------------------------------------------------------
# dense grid backend (NormalizedDenseSDFGrid)
# ---------------------------------------------------------------------------

def bake_grid(tables, bmin, bmax, n: int = 64):
    """Sample the SDF onto a dense [n,n,n] grid over the AABB (the
    reference bakes primitive batches into its grids the same way,
    SDFSBS::bakePrimitives)."""
    bmin = jnp.asarray(bmin, jnp.float32)
    bmax = jnp.asarray(bmax, jnp.float32)
    # full 3D lattice of cell centers
    t = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    gx = bmin[0] + (bmax[0] - bmin[0]) * t
    gy = bmin[1] + (bmax[1] - bmin[1]) * t
    gz = bmin[2] + (bmax[2] - bmin[2]) * t
    pz, py, px = jnp.meshgrid(gz, gy, gx, indexing="ij")
    pts = jnp.stack([px, py, pz], -1)                    # [n,n,n,3] (z,y,x)
    return eval_sdf(tables, pts), (bmin, bmax)


def eval_grid(grid, bounds, p):
    """Trilinear distance lookup at points [...,3] (8 gathers per point)."""
    bmin, bmax = bounds
    n = grid.shape[0]
    u = (p - bmin) / (bmax - bmin) * n - 0.5
    u = jnp.clip(u, 0.0, n - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0.astype(jnp.float32)
    flat = grid.reshape(-1)

    def g(dx, dy, dz):
        ix = jnp.clip(i0[..., 0] + dx, 0, n - 1)
        iy = jnp.clip(i0[..., 1] + dy, 0, n - 1)
        iz = jnp.clip(i0[..., 2] + dz, 0, n - 1)
        return jnp.take(flat, (iz * n + iy) * n + ix)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx
    c10 = g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx
    c01 = g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx
    c11 = g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx
    return (c00 * (1 - fy) + c10 * fy) * (1 - fz) \
        + (c01 * (1 - fy) + c11 * fy) * fz
