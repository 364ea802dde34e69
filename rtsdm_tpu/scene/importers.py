"""Scene importers.

Reference: plugins/importers/{AssimpImporter,USDImporter,PBRTImporter,
PythonImporter} behind SceneBuilder (Scene/Importer.cpp). The media formats
the reference ships (fbx/gltf via packman) aren't available here; this module
provides:
  * a Wavefront OBJ importer (+ .mtl subset) — pure host-side parsing
    (optionally accelerated by the native C++ parser, see native/),
  * a PythonImporter: a `.pyscene` file is executed and builds the scene
    through a builder API (reference PythonImporter semantics),
  * procedural scene names (scene/procedural.py) as a fallback.
"""
from __future__ import annotations

import os

import numpy as np

from .camera import Camera
from .scene import Scene, make_scene


def _parse_mtl(path):
    mats = {}
    cur = None
    if not os.path.exists(path):
        return mats
    for line in open(path):
        t = line.split()
        if not t:
            continue
        if t[0] == "newmtl":
            cur = t[1]
            mats[cur] = dict(base_color=(0.8, 0.8, 0.8))
        elif cur and t[0] == "Kd":
            mats[cur]["base_color"] = tuple(float(x) for x in t[1:4])
        elif cur and t[0] == "Ke":
            mats[cur]["emissive"] = tuple(float(x) for x in t[1:4])
        elif cur and t[0] == "Ns":
            mats[cur]["roughness"] = float(np.clip(1.0 - float(t[1]) / 1000.0, 0.05, 1.0))
        elif cur and t[0] == "d":
            o = float(t[1])
            if o < 1.0:
                mats[cur]["alpha_mode"] = 1
                mats[cur]["opacity"] = o
    return mats


def import_obj(path, camera: Camera | None = None, lights=None) -> Scene:
    """Wavefront OBJ -> triangle-soup Scene. Supports v/vn/vt/f (poly faces
    are fan-triangulated), usemtl/mtllib."""
    try:
        from ..native import scenekit
        parsed = scenekit.parse_obj(path)
    except Exception:
        parsed = None

    if parsed is None:
        verts, norms, uvs = [], [], []
        faces = []  # (vidx[3], nidx[3], tidx[3], mat)
        mtl = {}
        mat_names = []
        cur_mat = 0
        base = os.path.dirname(path)
        for line in open(path):
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "vn":
                norms.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                uvs.append([float(x) for x in t[1:3]])
            elif t[0] == "mtllib":
                mtl.update(_parse_mtl(os.path.join(base, t[1])))
            elif t[0] == "usemtl":
                if t[1] not in mat_names:
                    mat_names.append(t[1])
                cur_mat = mat_names.index(t[1])
            elif t[0] == "f":
                idx = []
                for w in t[1:]:
                    p = (w.split("/") + ["", ""])[:3]
                    idx.append(tuple(int(x) if x else 0 for x in p))
                for i in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[i], idx[i + 1], cur_mat))
        v = np.asarray(verts, np.float32)
        n = np.asarray(norms, np.float32) if norms else None
        tc = np.asarray(uvs, np.float32) if uvs else None

        tpos = np.zeros((len(faces), 3, 3), np.float32)
        tnorm = np.zeros((len(faces), 3, 3), np.float32) if n is not None else None
        ttex = np.zeros((len(faces), 3, 2), np.float32) if tc is not None else None
        mid = np.zeros((len(faces),), np.int32)
        for fi, (a, b, c, m) in enumerate(faces):
            for vi, w in enumerate((a, b, c)):
                tpos[fi, vi] = v[w[0] - 1]
                if tnorm is not None and w[2]:
                    tnorm[fi, vi] = n[w[2] - 1]
                if ttex is not None and w[1]:
                    ttex[fi, vi] = tc[w[1] - 1]
            mid[fi] = m
        materials = [mtl.get(name, dict(base_color=(0.8, 0.8, 0.8)))
                     for name in (mat_names or ["default"])]
    else:
        tpos, tnorm, ttex, mid, materials = parsed

    name = os.path.splitext(os.path.basename(path))[0]
    return make_scene(name, tpos, normals=tnorm, texcoords=ttex,
                      material_id=mid, materials=materials,
                      lights=lights or [dict(type="directional",
                                             direction=(0.3, -1.0, -0.4),
                                             intensity=(2.5, 2.5, 2.5))],
                      env_radiance=(0.3, 0.4, 0.55), camera=camera)


class SceneBuilderAPI:
    """The builder object handed to .pyscene scripts (reference
    PythonImporter: the script constructs the scene through SceneBuilder)."""

    def __init__(self):
        self.tris = []
        self.mat_ids = []
        self.materials = []
        self.lights = []
        self.camera = None
        self.env_radiance = (0.1, 0.1, 0.12)

    def addMaterial(self, **kwargs):
        self.materials.append(kwargs)
        return len(self.materials) - 1

    def addTriangles(self, positions, material=0):
        positions = np.asarray(positions, np.float32).reshape(-1, 3, 3)
        self.tris.append(positions)
        self.mat_ids.append(np.full((positions.shape[0],), material, np.int32))

    def addBox(self, bmin, bmax, material=0):
        from .procedural import _box
        self.addTriangles(_box(bmin, bmax), material)

    def addLight(self, **kwargs):
        self.lights.append(kwargs)

    def setCamera(self, **kwargs):
        self.camera = Camera.create(**kwargs)

    def setEnvRadiance(self, rgb):
        self.env_radiance = tuple(rgb)

    def build(self, name="pyscene") -> Scene:
        pos = np.concatenate(self.tris, 0) if self.tris else np.zeros((1, 3, 3), np.float32)
        mid = np.concatenate(self.mat_ids, 0) if self.mat_ids else np.zeros((1,), np.int32)
        return make_scene(name, pos, material_id=mid,
                          materials=self.materials or None, lights=self.lights,
                          env_radiance=self.env_radiance, camera=self.camera)


def import_pyscene(path) -> Scene:
    """Execute a .pyscene script: it sees `sceneBuilder` (reference
    PythonImporter contract)."""
    builder = SceneBuilderAPI()
    code = open(path).read()
    exec(compile(code, path, "exec"), {"sceneBuilder": builder, "np": np})
    return builder.build(os.path.splitext(os.path.basename(path))[0])


def load_any(path_or_name: str, aspect=1.0) -> Scene:
    """Importer dispatch by extension (Scene/Importer.cpp), falling back to
    the procedural registry."""
    if path_or_name.endswith(".obj"):
        return import_obj(path_or_name)
    if path_or_name.endswith(".pyscene"):
        return import_pyscene(path_or_name)
    from .procedural import load_scene
    return load_scene(path_or_name, aspect=aspect)
