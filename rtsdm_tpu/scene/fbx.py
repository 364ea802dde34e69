"""Binary FBX importer (the Assimp-importer path of the reference,
/root/reference/Source/plugins/importers/AssimpImporter/AssimpImporter.cpp —
FBX is the format that plugin exists for; this is a native parser for the
FBX 7.x binary container covering the mesh/material/transform subset the
renderer consumes).

Supported subset (documented, asserted, not silently wrong):
  * FBX binary versions 7000-7699 (32-bit record headers) and >= 7500
    (64-bit record headers), zlib-compressed or raw property arrays.
  * Objects/Geometry: Vertices, PolygonVertexIndex (polygons are
    fan-triangulated), LayerElementNormal (ByPolygonVertex / ByVertice /
    ByPolygon mappings, Direct / IndexToDirect), LayerElementUV,
    LayerElementMaterial (AllSame / ByPolygon).
  * Objects/Model: LclTranslation/Rotation(XYZ euler, degrees)/Scaling from
    Properties70; connected to geometry via OO Connections.
  * Objects/Material: DiffuseColor, EmissiveColor, Shininess -> roughness
    (gloss = sqrt(2/(shininess+2)) Blinn-Phong mapping), Opacity.
  * GlobalSettings UnitScaleFactor (applied as a uniform scale).
Unsupported nodes are ignored (cameras/lights/skins/anim curves — the
harness supplies its camera like the other importers in importers.py).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"Kaydara FBX Binary  \x00"


class _Node:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props, children):
        self.name = name
        self.props = props
        self.children = children

    def find(self, name):
        return [c for c in self.children if c.name == name]

    def first(self, name, default=None):
        for c in self.children:
            if c.name == name:
                return c
        return default


def _read_props(buf, off, n):
    props = []
    for _ in range(n):
        t = buf[off:off + 1]
        off += 1
        if t == b"Y":
            props.append(struct.unpack_from("<h", buf, off)[0]); off += 2
        elif t == b"C":
            props.append(bool(buf[off])); off += 1
        elif t == b"I":
            props.append(struct.unpack_from("<i", buf, off)[0]); off += 4
        elif t == b"F":
            props.append(struct.unpack_from("<f", buf, off)[0]); off += 4
        elif t == b"D":
            props.append(struct.unpack_from("<d", buf, off)[0]); off += 8
        elif t == b"L":
            props.append(struct.unpack_from("<q", buf, off)[0]); off += 8
        elif t in (b"f", b"d", b"l", b"i", b"b"):
            ln, enc, clen = struct.unpack_from("<III", buf, off)
            off += 12
            dt = {b"f": "<f4", b"d": "<f8", b"l": "<i8", b"i": "<i4",
                  b"b": "<u1"}[t]
            if enc == 1:
                raw = zlib.decompress(buf[off:off + clen])
                off += clen
            else:
                nbytes = ln * np.dtype(dt).itemsize
                raw = bytes(buf[off:off + nbytes])
                off += nbytes
            props.append(np.frombuffer(raw, dtype=dt, count=ln))
        elif t == b"S" or t == b"R":
            ln = struct.unpack_from("<I", buf, off)[0]
            off += 4
            raw = bytes(buf[off:off + ln])
            off += ln
            props.append(raw.decode("utf-8", "replace") if t == b"S" else raw)
        else:
            raise ValueError(f"FBX: unknown property type {t!r}")
    return props, off


def _read_node(buf, off, big):
    """Returns (node | None, next_off). None = the null terminator record."""
    if big:
        end, nprops, _plen = struct.unpack_from("<QQQ", buf, off)
        off += 24
    else:
        end, nprops, _plen = struct.unpack_from("<III", buf, off)
        off += 12
    name_len = buf[off]
    off += 1
    if end == 0 and nprops == 0 and name_len == 0:
        return None, off
    name = bytes(buf[off:off + name_len]).decode("ascii", "replace")
    off += name_len
    props, off = _read_props(buf, off, nprops)
    children = []
    while off < end:
        child, off = _read_node(buf, off, big)
        if child is None:
            break
        children.append(child)
    return _Node(name, props, children), end


def parse_fbx(path):
    """Parse a binary OR ASCII FBX file into the raw node tree (list of
    root nodes). The two containers carry the same node/property model; the
    ASCII form is `Name: p1, p2 { children }` with `a: ...` array bodies."""
    raw = open(path, "rb").read()
    if raw[:len(_MAGIC)] != _MAGIC:
        return _parse_ascii(raw.decode("utf-8", "replace"), path)
    buf = memoryview(raw)
    version = struct.unpack_from("<I", buf, 23)[0]
    big = version >= 7500
    off = 27
    roots = []
    while off < len(buf):
        node, off = _read_node(buf, off, big)
        if node is None:
            break
        roots.append(node)
    return roots, version


def _ascii_value(tok):
    tok = tok.strip()
    if not tok:
        return None
    if tok.startswith('"'):
        return tok.strip('"')
    if tok in ("T", "Y"):
        return True
    if tok in ("F", "N"):
        return False
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return tok


def _split_props(s):
    """Split a property list on commas outside quotes."""
    out, cur, q = [], [], False
    for ch in s:
        if ch == '"':
            q = not q
            cur.append(ch)
        elif ch == "," and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return [v for v in (_ascii_value(t) for t in out) if v is not None]


def _parse_ascii(text, path):
    """ASCII FBX -> the same node tree the binary parser yields. Array
    nodes (`Vertices: *24 { a: ... }`) collapse to a single numpy prop like
    their binary counterparts (float64 if any value has a '.', else int64)."""
    if "FBX" not in text[:512] and ":" not in text[:512]:
        raise ValueError(f"{path}: not an FBX file")
    version = 7400
    import re
    m = re.search(r"FBXVersion:\s*(\d+)", text)
    if m:
        version = int(m.group(1))

    lines = [ln.split(";", 1)[0] for ln in text.splitlines()]
    stack = [[]]  # child lists; stack[0] = roots
    pending = None  # _Node awaiting '{' contents
    array_node = None  # node collecting 'a:' values

    for ln in lines:
        s = ln.strip()
        if not s:
            continue
        if array_node is not None:
            body = s[2:] if s.startswith("a:") else s
            closing = body.rstrip().endswith("}")
            if closing:
                body = body.rstrip()[:-1]
            array_node[1].extend(
                t for t in (x.strip() for x in body.split(",")) if t)
            if closing:
                node, vals = array_node
                arr = (np.asarray([float(v) for v in vals], np.float64)
                       if any(("." in v or "e" in v or "E" in v)
                              for v in vals)
                       else np.asarray([int(v) for v in vals], np.int64))
                node.props = [arr]
                array_node = None
            continue
        if s == "}":
            stack.pop()
            continue
        m = re.match(r"^([A-Za-z_][\w ]*):\s*(.*)$", s)
        if not m:
            continue
        name, rest = m.group(1), m.group(2).strip()
        opens = rest.endswith("{")
        if opens:
            rest = rest[:-1].strip()
        node = _Node(name, [], [])
        stack[-1].append(node)
        if rest.startswith("*"):
            # array header: '*N {' — contents come from 'a:' lines
            if opens:
                array_node = (node, [])
            continue
        node.props = _split_props(rest)
        if opens:
            stack.append(node.children)
    return stack[0], version


def _p70(node):
    """Properties70 -> {name: value-tuple}."""
    out = {}
    p70 = node.first("Properties70")
    if p70 is None:
        return out
    for p in p70.find("P"):
        if p.props:
            out[p.props[0]] = tuple(p.props[4:])
    return out


def _euler_xyz_deg(rx, ry, rz):
    cx, sx = np.cos(np.radians(rx)), np.sin(np.radians(rx))
    cy, sy = np.cos(np.radians(ry)), np.sin(np.radians(ry))
    cz, sz = np.cos(np.radians(rz)), np.sin(np.radians(rz))
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mz @ my @ mx


def _model_matrix(props):
    t = np.asarray(props.get("Lcl Translation", (0.0, 0.0, 0.0)), np.float64)
    r = props.get("Lcl Rotation", (0.0, 0.0, 0.0))
    s = np.asarray(props.get("Lcl Scaling", (1.0, 1.0, 1.0)), np.float64)
    m = np.eye(4)
    m[:3, :3] = _euler_xyz_deg(*r) * s[None, :]
    m[:3, 3] = t
    return m


def _layer_values(geom, layer_name, value_name, index_name, n_pv, poly_of_pv,
                  cp=None):
    """Resolve a layer element to per-polygon-vertex values or None."""
    layer = geom.first(layer_name)
    if layer is None:
        return None
    mapping = (layer.first("MappingInformationType").props[0]
               if layer.first("MappingInformationType") else "ByPolygonVertex")
    ref = (layer.first("ReferenceInformationType").props[0]
           if layer.first("ReferenceInformationType") else "Direct")
    vals_node = layer.first(value_name)
    if vals_node is None:
        return None
    vals = np.asarray(vals_node.props[0], np.float64)
    comp = 2 if value_name == "UV" else 3
    vals = vals.reshape(-1, comp)
    if ref == "IndexToDirect" and layer.first(index_name) is not None:
        idx = np.asarray(layer.first(index_name).props[0], np.int64)
        vals = vals[np.clip(idx, 0, len(vals) - 1)]
    if mapping == "ByPolygonVertex":
        return vals[:n_pv] if len(vals) >= n_pv else None
    if mapping in ("ByVertice", "ByVertex", "ByControlPoint"):
        # one value per control point: expand through the polygon-vertex ->
        # control-point index array
        if cp is None:
            return None
        return vals[np.clip(cp, 0, len(vals) - 1)]
    if mapping == "ByPolygon":
        return vals[poly_of_pv]
    return None


def import_fbx(path, camera=None):
    """Binary FBX -> triangle-soup Scene (see module docstring for the
    supported subset)."""
    from .scene import make_scene

    roots, _version = parse_fbx(path)
    by_name = {r.name: r for r in roots}
    objects = by_name.get("Objects")
    if objects is None:
        raise ValueError(f"{path}: FBX file has no Objects section")

    unit = 1.0
    gs = by_name.get("GlobalSettings")
    if gs is not None:
        u = _p70(gs).get("UnitScaleFactor")
        if u:
            unit = float(u[0]) / 100.0  # cm-based: 100 = 1 unit per meter

    # connections: child-id -> [parent ids] (OO)
    conns = []
    cn = by_name.get("Connections")
    if cn is not None:
        for c in cn.find("C"):
            if len(c.props) >= 3 and c.props[0] == "OO":
                conns.append((c.props[1], c.props[2]))
    parents = {}
    for src, dst in conns:
        parents.setdefault(src, []).append(dst)

    models = {}     # id -> matrix
    materials = {}  # id -> material dict
    mat_order = {}  # model id -> [material ids] in connection order
    for node in objects.find("Model"):
        mid = node.props[0] if node.props else 0
        models[mid] = _model_matrix(_p70(node))
    for node in objects.find("Material"):
        mid = node.props[0] if node.props else 0
        p = _p70(node)
        diff = p.get("DiffuseColor", (0.8, 0.8, 0.8))
        emis = p.get("EmissiveColor", (0.0, 0.0, 0.0))
        shin = float(p.get("Shininess", (0.0,))[0] or 0.0)
        rough = float(np.sqrt(2.0 / (shin + 2.0))) if shin > 0 else 0.7
        materials[mid] = dict(base_color=tuple(float(x) for x in diff[:3]),
                              emissive=tuple(float(x) for x in emis[:3]),
                              roughness=rough)
    for src, dst in conns:
        if src in materials and dst in models:
            mat_order.setdefault(dst, []).append(src)

    all_pos, all_nrm, all_uv, all_mid = [], [], [], []
    mat_table = []   # material dicts in emitted order
    mat_index = {}   # material id -> index in mat_table

    def _mat_slot(mat_id):
        if mat_id not in mat_index:
            mat_index[mat_id] = len(mat_table)
            mat_table.append(materials.get(mat_id,
                                           dict(base_color=(0.8, 0.8, 0.8))))
        return mat_index[mat_id]

    for geom in objects.find("Geometry"):
        gid = geom.props[0] if geom.props else 0
        vn = geom.first("Vertices")
        pn = geom.first("PolygonVertexIndex")
        if vn is None or pn is None:
            continue
        verts = np.asarray(vn.props[0], np.float64).reshape(-1, 3)
        pvi = np.asarray(pn.props[0], np.int64)
        n_pv = len(pvi)
        cp = np.where(pvi < 0, ~pvi, pvi)  # control-point index per pv

        # polygon id per polygon-vertex (negative index closes a polygon)
        poly_of_pv = np.cumsum(np.concatenate([[0], (pvi < 0)[:-1]]))

        # model transform (first connected Model)
        m = np.eye(4)
        mat_ids = []
        for pid in parents.get(gid, []):
            if pid in models:
                m = models[pid]
                mat_ids = mat_order.get(pid, [])
                break
        rot = m[:3, :3]
        try:
            nrm_m = np.linalg.inv(rot)  # row-vector inverse-transpose
        except np.linalg.LinAlgError:
            nrm_m = np.eye(3)

        nrm_pv = _layer_values(geom, "LayerElementNormal", "Normals",
                               "NormalsIndex", n_pv, poly_of_pv, cp)
        uv_pv = _layer_values(geom, "LayerElementUV", "UV", "UVIndex",
                              n_pv, poly_of_pv, cp)

        # per-polygon material index
        lm = geom.first("LayerElementMaterial")
        poly_mat = None
        if lm is not None and lm.first("Materials") is not None:
            marr = np.asarray(lm.first("Materials").props[0], np.int64)
            mp = (lm.first("MappingInformationType").props[0]
                  if lm.first("MappingInformationType") else "AllSame")
            if mp == "ByPolygon" and len(marr) > 0:
                poly_mat = marr
            elif len(marr) > 0:
                poly_mat = np.full(int(poly_of_pv[-1]) + 1, marr[0])

        # fan-triangulate: emit (first, i, i+1) per polygon
        tris = []       # (pv indices of the 3 corners, poly id)
        start = 0
        for i in range(n_pv):
            if pvi[i] < 0:
                for j in range(start + 1, i):
                    tris.append((start, j, j + 1, poly_of_pv[i]))
                start = i + 1
        if not tris:
            continue
        tri = np.asarray([t[:3] for t in tris], np.int64)   # [T,3] pv idx
        tri_poly = np.asarray([t[3] for t in tris], np.int64)

        pos = verts[cp[tri]]                                 # [T,3,3]
        pos = pos @ rot.T + m[:3, 3]
        all_pos.append(pos * unit)

        if nrm_pv is not None:
            nrm = nrm_pv[tri] @ nrm_m
        else:
            e1 = pos[:, 1] - pos[:, 0]
            e2 = pos[:, 2] - pos[:, 0]
            fn = np.cross(e1, e2)
            fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
            nrm = np.repeat(fn[:, None, :], 3, axis=1)
        nl = np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        all_nrm.append(nrm / nl)

        all_uv.append(uv_pv[tri][..., :2] if uv_pv is not None
                      else np.zeros((len(tri), 3, 2)))

        if poly_mat is not None and mat_ids:
            slot_of = np.asarray(
                [_mat_slot(mat_ids[min(int(x), len(mat_ids) - 1)])
                 for x in poly_mat], np.int32)
            all_mid.append(slot_of[tri_poly])
        elif mat_ids:
            all_mid.append(np.full(len(tri), _mat_slot(mat_ids[0]), np.int32))
        else:
            all_mid.append(np.full(len(tri), _mat_slot(-1), np.int32))

    if not all_pos:
        raise ValueError(f"{path}: FBX file contains no polygon geometry")

    positions = np.concatenate(all_pos).astype(np.float32)
    normals = np.concatenate(all_nrm).astype(np.float32)
    texcoords = np.concatenate(all_uv).astype(np.float32)
    material_id = np.concatenate(all_mid)
    import os
    return make_scene(os.path.basename(path), positions, normals=normals,
                      texcoords=texcoords, material_id=material_id,
                      materials=mat_table, camera=camera)
