"""The reference PythonImporter object model, so .pyscene assets execute
VERBATIM (reference Source/plugins/importers/PythonImporter/ + the
SceneBuilder python bindings, Scene/SceneBuilder.h:54; exercised by e.g.
/root/reference/scripts/sdf-editor/SDFEditorStartScene.pyscene).

Covered surface: Material (attribute style), TriangleMesh factories
(createQuad/createCube/createSphere), SDFGrid.createSBS/createSVS/
createNDGrid + loadPrimitivesFromFile (the JSON .sdf format written by the
SDFEditor), Transform (scaling/translation/rotationEulerDeg), Camera
(attribute style), float3/float4, and the node/instance half of
SceneBuilder. SDF grid instances are meshed at import via marching
tetrahedra (scene/meshing.py) — the TPU ray/raster path is triangle-native.
"""
from __future__ import annotations

import json
import math
import os

import numpy as np


def float3(*a):
    if len(a) == 1:
        a = (a[0],) * 3
    return np.asarray(a, np.float32)


def float4(*a):
    if len(a) == 1:
        a = (a[0],) * 4
    return np.asarray(a, np.float32)


class Material:
    """Attribute-style material (reference Scene/Material python binding)."""

    def __init__(self, name=""):
        self.name = name
        self.baseColor = np.asarray([0.8, 0.8, 0.8, 1.0], np.float32)
        self.roughness = 0.7
        self.metallic = 0.0
        self.emissiveColor = np.zeros(3, np.float32)
        self.emissiveFactor = 1.0
        self.indexOfRefraction = 1.5
        self.doubleSided = False
        self.specularParams = None  # accepted, spec handled via roughness

    def to_props(self) -> dict:
        return dict(base_color=tuple(np.asarray(self.baseColor)[:3]),
                    roughness=float(self.roughness),
                    metallic=float(self.metallic),
                    emissive=tuple(np.asarray(self.emissiveColor, np.float32)
                                   * float(self.emissiveFactor)),
                    ior=float(self.indexOfRefraction),
                    double_sided=bool(self.doubleSided))


class TriangleMesh:
    """Host triangle mesh with the reference's factory surface."""

    def __init__(self, positions: np.ndarray):
        self.positions = np.asarray(positions, np.float32)  # [T,3,3]

    @staticmethod
    def createQuad(size=(1.0, 1.0)):
        """XZ-plane quad centered at origin, +Y normal (TriangleMesh.cpp
        createQuad)."""
        sx, sz = (float(size[0]) / 2, float(size[1]) / 2) \
            if np.ndim(size) else (float(size) / 2,) * 2
        a = [-sx, 0.0, -sz]
        b = [sx, 0.0, -sz]
        c = [sx, 0.0, sz]
        d = [-sx, 0.0, sz]
        return TriangleMesh(np.asarray([[a, c, b], [a, d, c]], np.float32))

    @staticmethod
    def createCube(size=(1.0, 1.0, 1.0)):
        h = np.asarray(size, np.float32).reshape(-1)
        if h.size == 1:
            h = np.repeat(h, 3)
        h = h / 2
        from .procedural import _box
        return TriangleMesh(np.asarray(_box(-h, h), np.float32))

    @staticmethod
    def createSphere(radius=0.5, segmentsU=16, segmentsV=16):
        tris = []
        for i in range(segmentsV):
            t0 = math.pi * i / segmentsV
            t1 = math.pi * (i + 1) / segmentsV
            for j in range(segmentsU):
                p0 = 2 * math.pi * j / segmentsU
                p1 = 2 * math.pi * (j + 1) / segmentsU

                def pt(theta, phi):
                    return [radius * math.sin(theta) * math.cos(phi),
                            radius * math.cos(theta),
                            radius * math.sin(theta) * math.sin(phi)]
                a, b = pt(t0, p0), pt(t0, p1)
                c, d = pt(t1, p1), pt(t1, p0)
                if i > 0:
                    tris.append([a, b, c])
                if i < segmentsV - 1:
                    tris.append([a, c, d])
        return TriangleMesh(np.asarray(tris, np.float32))


class Transform:
    """scaling / translation / rotationEulerDeg -> 4x4 (reference
    Utils/Math python Transform binding; R applied after S, T last)."""

    def __init__(self, scaling=1.0, translation=(0.0, 0.0, 0.0),
                 rotationEulerDeg=(0.0, 0.0, 0.0),
                 rotationEuler=None):
        s = np.asarray(scaling, np.float32).reshape(-1)
        if s.size == 1:
            s = np.repeat(s, 3)
        rot = (np.radians(np.asarray(rotationEulerDeg, np.float32))
               if rotationEuler is None
               else np.asarray(rotationEuler, np.float32))
        rx, ry, rz = [float(v) for v in rot]

        def rot_x(a):
            c, si = math.cos(a), math.sin(a)
            return np.asarray([[1, 0, 0], [0, c, -si], [0, si, c]], np.float32)

        def rot_y(a):
            c, si = math.cos(a), math.sin(a)
            return np.asarray([[c, 0, si], [0, 1, 0], [-si, 0, c]], np.float32)

        def rot_z(a):
            c, si = math.cos(a), math.sin(a)
            return np.asarray([[c, -si, 0], [si, c, 0], [0, 0, 1]], np.float32)
        r = rot_z(rz) @ rot_y(ry) @ rot_x(rx)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r * s[None, :]
        m[:3, 3] = np.asarray(translation, np.float32)
        self.matrix = m


class SDFGrid:
    """SDF grid asset: primitives from the SDFEditor's JSON .sdf format
    (Scene/SDFs/*; shape/operation enums SDF3DPrimitiveCommon.slang:40,
    Utils/SDF/SDFOperationType.slang). Meshed at scene build."""

    def __init__(self, kind="SBS"):
        self.kind = kind
        self.grid_width = 256
        self.prims = None           # scene.sdf.SDFPrimitiveList
        self.values = None          # raw [N,N,N] grid alternative
        self.base_dir = "."

    # factory names of the reference backends: Sparse Brick Set, Sparse
    # Voxel Set, Normalized Dense, Sparse Voxel Octree — backend choice is
    # a GPU memory-layout concern; all mesh identically here
    @staticmethod
    def createSBS(*a, **k):
        return SDFGrid("SBS")

    @staticmethod
    def createSVS(*a, **k):
        return SDFGrid("SVS")

    @staticmethod
    def createNDGrid(*a, **k):
        return SDFGrid("ND")

    @staticmethod
    def createSVO(*a, **k):
        return SDFGrid("SVO")

    def loadPrimitivesFromFile(self, path, gridWidth=256):
        from . import sdf as S
        self.grid_width = int(gridWidth)
        full = path if os.path.isabs(path) else os.path.join(self.base_dir,
                                                             path)
        with open(full) as f:
            entries = json.load(f)
        kind_map = {0: S.PRIM_SPHERE,   # Sphere(r)
                    1: S.PRIM_SPHERE,   # Ellipsoid -> mean-radius sphere
                    2: S.PRIM_BOX,      # Box(hx,hy,hz)
                    3: S.PRIM_TORUS,    # Torus(R) + blobbing thickness
                    4: S.PRIM_CAPSULE,  # Cone -> capsule stand-in
                    5: S.PRIM_CAPSULE}  # Capsule(halfLen) + blobbing
        op_map = {0: S.OP_UNION, 1: S.OP_SUBTRACT, 2: S.OP_INTERSECT,
                  3: S.OP_SMOOTH_UNION,
                  4: S.OP_SUBTRACT,     # smooth sub/int -> hard (no
                  5: S.OP_INTERSECT}    # smooth variants in ops table)
        pl = S.SDFPrimitiveList()
        for e in entries:
            st = int(e["shape_type"])
            sd = np.asarray(e.get("shape_data", [0.1, 0, 0]), np.float32)
            blob = float(e.get("shape_blobbing", 0.0))
            if st == 0:
                params = (float(sd[0]) + blob,)
            elif st == 1:
                params = (float(np.mean(sd)) + blob,)
            elif st == 2:
                params = tuple(float(v) + blob for v in sd[:3])
            elif st == 3:
                params = (float(sd[0]), max(blob, 1e-3))
            else:
                params = (float(sd[0]), max(blob, 1e-3))
            # inv_rot_scale ignored beyond scale: shipped assets are
            # near-axis-aligned; rotation_y extracted when present
            m = np.asarray(e.get("inv_rot_scale",
                                 [1, 0, 0, 0, 1, 0, 0, 0, 1]),
                           np.float32).reshape(3, 3)
            rot_y = float(math.atan2(m[0, 2], m[0, 0]))
            pl.add(kind_map[st], e.get("translation", (0, 0, 0)), params,
                   rotation_y=rot_y, op=op_map[int(e.get(
                       "operation_type", 0))],
                   smoothing=float(e.get("operation_smoothing", 0.0)))
        self.prims = pl
        return self

    def setValues(self, values, gridWidth=None):
        self.values = np.asarray(values, np.float32)
        if gridWidth:
            self.grid_width = int(gridWidth)

    def mesh(self, resolution: int = 48) -> np.ndarray:
        """[T,3,3] triangles of the zero iso-surface in the grid's local
        unit cube [-0.5, 0.5]^3 (the reference grid's local domain)."""
        from .meshing import marching_tetrahedra
        if self.values is not None:
            g = self.values
            return marching_tetrahedra(g, (-0.5,) * 3, (0.5,) * 3)
        if self.prims is None or len(self.prims) == 0:
            return np.zeros((0, 3, 3), np.float32)
        from . import sdf as S
        import jax.numpy as jnp
        tables = self.prims.tables()
        n = int(resolution)
        xs = np.linspace(-0.5, 0.5, n, dtype=np.float32)
        pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
        d = np.asarray(S.eval_sdf(tables, jnp.asarray(pts.reshape(-1, 3))))
        return marching_tetrahedra(d.reshape(n, n, n), (-0.5,) * 3,
                                   (0.5,) * 3)


class CameraObj:
    """Attribute-style camera adapter (reference Camera python binding)."""

    def __init__(self, name="Camera"):
        self.name = name
        self.position = np.asarray([0.0, 0.0, 3.0], np.float32)
        self.target = np.asarray([0.0, 0.0, 0.0], np.float32)
        self.up = np.asarray([0.0, 1.0, 0.0], np.float32)
        self.focalLength = 21.0
        self.nearPlane = 0.1
        self.farPlane = 1000.0
