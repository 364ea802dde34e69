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


# ---------------------------------------------------------------------------
# glTF 2.0 importer (reference plugins/importers/AssimpImporter handles
# gltf/glb/fbx via Assimp, 13.4k LoC; this is a dependency-free reimport of
# the glTF subset the renderer consumes: triangle meshes, node-hierarchy TRS
# transforms, pbrMetallicRoughness materials incl. alphaMode=MASK,
# doubleSided, emissiveFactor, punctual lights ext).
# ---------------------------------------------------------------------------

_GLTF_CTYPE = {5120: ("b", 1), 5121: ("B", 1), 5122: ("h", 2),
               5123: ("H", 2), 5125: ("I", 4), 5126: ("f", 4)}
_GLTF_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _gltf_load_buffers(doc, base_dir, glb_bin):
    import base64
    bufs = []
    for b in doc.get("buffers", []):
        uri = b.get("uri")
        if uri is None:
            bufs.append(glb_bin)
        elif uri.startswith("data:"):
            bufs.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                bufs.append(f.read())
    return bufs


def _gltf_accessor(doc, bufs, idx):
    acc = doc["accessors"][idx]
    view = doc["bufferViews"][acc["bufferView"]]
    ch, csize = _GLTF_CTYPE[acc["componentType"]]
    ncomp = _GLTF_NCOMP[acc["type"]]
    count = acc["count"]
    elem = csize * ncomp
    stride = view.get("byteStride", elem)
    off = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    raw = bufs[view["buffer"]]
    a = np.frombuffer(raw, dtype=np.dtype(ch),
                      count=(count - 1) * (stride // csize) + ncomp,
                      offset=off)
    if stride != elem:
        a = np.lib.stride_tricks.as_strided(
            a, (count, ncomp), (stride, csize)).copy()
    else:
        a = a[:count * ncomp].reshape(count, ncomp)
    return np.ascontiguousarray(a)


def _gltf_node_world(doc, idx, parent):
    node = doc["nodes"][idx]
    if "matrix" in node:
        m = np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    else:
        t = np.asarray(node.get("translation", (0, 0, 0)), np.float32)
        q = np.asarray(node.get("rotation", (0, 0, 0, 1)), np.float32)
        s = np.asarray(node.get("scale", (1, 1, 1)), np.float32)
        x, y, z, w = q
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]],
            np.float32)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r * s[None, :]
        m[:3, 3] = t
    return parent @ m


def import_gltf(path, camera: Camera | None = None) -> Scene:
    """Import .gltf / .glb into a triangle-soup Scene. Node transforms are
    flattened at import (SceneBuilder-style); materials map to the SoA
    material table (baseColorFactor -> base_color, alphaMode MASK ->
    alpha_mode=1 w/ cutoff-driven opacity, doubleSided, emissiveFactor)."""
    import json as _json
    import struct

    base_dir = os.path.dirname(os.path.abspath(path))
    glb_bin = None
    if path.endswith(".glb"):
        with open(path, "rb") as f:
            magic, _ver, _len = struct.unpack("<III", f.read(12))
            assert magic == 0x46546C67, "not a GLB file"
            chunks = {}
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                clen, ctype = struct.unpack("<II", hdr)
                chunks[ctype] = f.read(clen)
        doc = _json.loads(chunks[0x4E4F534A])
        glb_bin = chunks.get(0x004E4942)
    else:
        with open(path) as f:
            doc = _json.load(f)
    bufs = _gltf_load_buffers(doc, base_dir, glb_bin)

    # materials
    mats = []
    for md in doc.get("materials", [{}]):
        pbr = md.get("pbrMetallicRoughness", {})
        base = pbr.get("baseColorFactor", [0.8, 0.8, 0.8, 1.0])
        alpha_mask = md.get("alphaMode", "OPAQUE") == "MASK"
        mats.append(dict(
            base_color=tuple(base[:3]), roughness=pbr.get("roughnessFactor", 0.7),
            emissive=tuple(md.get("emissiveFactor", (0.0, 0.0, 0.0))),
            double_sided=bool(md.get("doubleSided", False)),
            alpha_mode=1 if alpha_mask else 0,
            opacity=float(base[3]) if alpha_mask else 1.0))
    if not doc.get("materials"):
        mats = [dict(base_color=(0.8, 0.8, 0.8))]

    # flatten the node hierarchy
    world = {}

    def walk(idx, parent):
        m = _gltf_node_world(doc, idx, parent)
        world[idx] = m
        for c in doc["nodes"][idx].get("children", []):
            walk(c, m)

    scene_def = doc.get("scenes", [{}])[doc.get("scene", 0)]
    for root in scene_def.get("nodes", range(len(doc.get("nodes", [])))):
        walk(root, np.eye(4, dtype=np.float32))

    tris, norms, uvs, mids, nodes = [], [], [], [], []
    for nidx, m in world.items():
        node = doc["nodes"][nidx]
        if "mesh" not in node:
            continue
        mesh = doc["meshes"][node["mesh"]]
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:
                continue  # triangles only
            pos = _gltf_accessor(doc, bufs, prim["attributes"]["POSITION"])
            pos = pos.astype(np.float32) @ m[:3, :3].T + m[:3, 3]
            if "indices" in prim:
                idx = _gltf_accessor(doc, bufs, prim["indices"]).reshape(-1)
            else:
                idx = np.arange(len(pos))
            idx = idx.astype(np.int64).reshape(-1, 3)
            tris.append(pos[idx])
            if "NORMAL" in prim["attributes"]:
                nrm = _gltf_accessor(doc, bufs, prim["attributes"]["NORMAL"])
                nrm = nrm.astype(np.float32) @ np.linalg.inv(m[:3, :3]).T
                norms.append(nrm[idx])
            else:
                norms.append(None)
            if "TEXCOORD_0" in prim["attributes"]:
                uv = _gltf_accessor(doc, bufs,
                                    prim["attributes"]["TEXCOORD_0"])
                uvs.append(uv.astype(np.float32)[idx])
            else:
                uvs.append(None)
            mids.append(np.full(len(idx), prim.get("material", 0), np.int32))
            nodes.append(np.full(len(idx), nidx, np.int32))

    if not tris:
        raise ValueError(f"no triangle geometry in {path}")
    positions = np.concatenate(tris)
    t = len(positions)
    normals = (np.concatenate([n if n is not None
                               else np.zeros((len(x), 3, 3), np.float32)
                               for n, x in zip(norms, tris)])
               if any(n is not None for n in norms) else None)
    texcoords = (np.concatenate([u if u is not None
                                 else np.zeros((len(x), 3, 2), np.float32)
                                 for u, x in zip(uvs, tris)])
                 if any(u is not None for u in uvs) else None)
    material_id = np.concatenate(mids)
    node_id = np.concatenate(nodes)

    # punctual lights extension
    lights = []
    for ld in doc.get("extensions", {}).get("KHR_lights_punctual",
                                            {}).get("lights", []):
        c = np.asarray(ld.get("color", (1, 1, 1)), np.float32) \
            * ld.get("intensity", 1.0)
        if ld.get("type") == "directional":
            lights.append(dict(type="directional", direction=(0, -1, 0),
                               intensity=tuple(c)))
        else:
            lights.append(dict(type="point", position=(0, 3, 0),
                               intensity=tuple(c)))

    name = os.path.splitext(os.path.basename(path))[0]
    return make_scene(name, positions, normals=normals, texcoords=texcoords,
                      material_id=material_id, materials=mats,
                      lights=lights or None, camera=camera, node_id=node_id)


def load_any(path_or_name: str, aspect=1.0) -> Scene:
    """Importer dispatch by extension (Scene/Importer.cpp), falling back to
    the procedural registry."""
    if path_or_name.endswith(".obj"):
        return import_obj(path_or_name)
    if path_or_name.endswith(".pyscene"):
        return import_pyscene(path_or_name)
    if path_or_name.endswith((".gltf", ".glb")):
        return import_gltf(path_or_name)
    from .procedural import load_scene
    return load_scene(path_or_name, aspect=aspect)
