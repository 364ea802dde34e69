"""Binary FBX importer round-trip tests (scene/fbx.py).

A minimal binary-FBX writer lives here (tests only) covering the same
subset the importer reads: node records, scalar + array properties (raw and
zlib), Properties70, Connections. Reference: the Assimp importer plugin
(/root/reference/Source/plugins/importers/AssimpImporter/)."""
import struct
import zlib

import numpy as np
import pytest

from rtsdm_tpu.scene.fbx import import_fbx, parse_fbx


# --------------------------------------------------------------------------
# writer (v7400: 32-bit record headers, 13-byte null records)
# --------------------------------------------------------------------------

def _prop(v, compress=False):
    if isinstance(v, bool):
        return b"C" + struct.pack("<B", v)
    if isinstance(v, int):
        return b"L" + struct.pack("<q", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(v, np.ndarray):
        code = {np.dtype("f8"): b"d", np.dtype("i4"): b"i",
                np.dtype("i8"): b"l", np.dtype("f4"): b"f"}[v.dtype]
        raw = v.tobytes()
        if compress:
            comp = zlib.compress(raw)
            return (code + struct.pack("<III", len(v), 1, len(comp)) + comp)
        return code + struct.pack("<III", len(v), 0, len(raw)) + raw
    raise TypeError(type(v))


_NULL = b"\x00" * 13


def _node(name, props=(), children=(), compress=False):
    nb = name.encode()
    pb = b"".join(_prop(p, compress) for p in props)
    cb = b"".join(children)
    if children:
        cb += _NULL
    body = struct.pack("<B", len(nb)) + nb + pb + cb
    return body, len(props), len(pb)


def _emit(name, props=(), children=(), compress=False):
    """Returns a closure: offset -> bytes (end offsets are absolute)."""
    body, nprops, plen = _node(name, props, children, compress)

    def render(off):
        end = off + 12 + len(body)
        return struct.pack("<III", end, nprops, plen) + body
    return render


def _emit_tree(name, props=(), children=(), compress=False):
    """Render children first (they need absolute offsets), so build bottom-up
    with placeholder passes: simple two-pass fixpoint works because sizes
    are offset-independent."""
    rendered_children = []
    # sizes don't depend on offsets; render with dummy offsets to get sizes
    def render_at(off):
        out = b""
        coff = None
        # header+name+props
        nb = name.encode()
        pb = b"".join(_prop(p, compress) for p in props)
        head_len = 12 + 1 + len(nb) + len(pb)
        coff = off + head_len
        cbs = []
        for ch in children:
            cb = ch(coff)
            cbs.append(cb)
            coff += len(cb)
        cb_all = b"".join(cbs)
        if children:
            cb_all += _NULL
            coff += len(_NULL)
        end = off + head_len + len(cb_all)
        return (struct.pack("<III", end, len(props), len(pb))
                + struct.pack("<B", len(nb)) + nb + pb + cb_all)
    return render_at


def write_fbx(path, roots):
    header = b"Kaydara FBX Binary  \x00" + bytes([0x1A, 0x00]) \
        + struct.pack("<I", 7400)
    out = header
    off = len(header)
    for r in roots:
        b = r(off)
        out += b
        off += len(b)
    out += _NULL
    open(path, "wb").write(out)


def _cube_fbx(path, compress=False, rotate_deg=0.0, scale=1.0,
              translate=(0.0, 0.0, 0.0)):
    verts = np.array([
        -1, -1, -1,  1, -1, -1,  1, 1, -1,  -1, 1, -1,   # back quad
        -1, -1, 1,   1, -1, 1,   1, 1, 1,   -1, 1, 1,    # front quad
    ], np.float64)
    # two quads (fan-triangulated by the importer) + 1 triangle
    pvi = np.array([0, 1, 2, -4,      # quad 0..3 (close = ~3)
                    4, 5, 6, -8,      # quad 4..7
                    0, 1, -6], np.int32)  # tri 0,1,5
    normals = np.tile(np.array([0.0, 0.0, 1.0]), 11)
    p70 = _emit_tree("Properties70", children=[
        _emit_tree("P", ["Lcl Translation", "Lcl Translation", "", "A",
                         float(translate[0]), float(translate[1]),
                         float(translate[2])]),
        _emit_tree("P", ["Lcl Rotation", "Lcl Rotation", "", "A",
                         0.0, float(rotate_deg), 0.0]),
        _emit_tree("P", ["Lcl Scaling", "Lcl Scaling", "", "A",
                         float(scale), float(scale), float(scale)]),
    ])
    mat_p70 = _emit_tree("Properties70", children=[
        _emit_tree("P", ["DiffuseColor", "Color", "", "A", 0.9, 0.2, 0.1]),
        _emit_tree("P", ["EmissiveColor", "Color", "", "A", 0.0, 2.0, 0.0]),
        _emit_tree("P", ["Shininess", "double", "Number", "", 98.0]),
    ])
    geo = _emit_tree("Geometry", [1001, "Geometry::cube", "Mesh"], [
        _emit_tree("Vertices", [verts], compress=compress),
        _emit_tree("PolygonVertexIndex", [pvi], compress=compress),
        _emit_tree("LayerElementNormal", [0], [
            _emit_tree("MappingInformationType", ["ByPolygonVertex"]),
            _emit_tree("ReferenceInformationType", ["Direct"]),
            _emit_tree("Normals", [normals], compress=compress),
        ]),
        _emit_tree("LayerElementMaterial", [0], [
            _emit_tree("MappingInformationType", ["AllSame"]),
            _emit_tree("ReferenceInformationType", ["IndexToDirect"]),
            _emit_tree("Materials", [np.array([0], np.int32)]),
        ]),
    ])
    model = _emit_tree("Model", [2001, "Model::cube", "Mesh"], [p70])
    mat = _emit_tree("Material", [3001, "Material::red", ""], [mat_p70])
    objects = _emit_tree("Objects", children=[geo, model, mat])
    conns = _emit_tree("Connections", children=[
        _emit_tree("C", ["OO", 1001, 2001]),
        _emit_tree("C", ["OO", 3001, 2001]),
    ])
    gs = _emit_tree("GlobalSettings", children=[
        _emit_tree("Properties70", children=[
            _emit_tree("P", ["UnitScaleFactor", "double", "Number", "",
                             100.0]),
        ]),
    ])
    write_fbx(path, [gs, objects, conns])


def test_fbx_parse_roundtrip(tmp_path):
    p = str(tmp_path / "cube.fbx")
    _cube_fbx(p)
    roots, version = parse_fbx(p)
    assert version == 7400
    names = [r.name for r in roots]
    assert "Objects" in names and "Connections" in names
    objects = roots[names.index("Objects")]
    geo = objects.first("Geometry")
    assert geo is not None
    v = geo.first("Vertices").props[0]
    assert v.shape == (24,)


def test_fbx_import_counts_and_materials(tmp_path):
    p = str(tmp_path / "cube.fbx")
    _cube_fbx(p)
    scene = import_fbx(p)
    # 2 quads -> 4 tris, 1 tri -> 1: 5 triangles
    assert int(scene.num_triangles) == 5
    mat = np.asarray(scene.mat_base_color)
    assert mat.shape[0] == 1
    np.testing.assert_allclose(mat[0], [0.9, 0.2, 0.1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.mat_emissive)[0],
                               [0.0, 2.0, 0.0], atol=1e-6)
    rough = float(np.asarray(scene.mat_roughness)[0])
    assert abs(rough - np.sqrt(2.0 / 100.0)) < 1e-5


def test_fbx_zlib_arrays(tmp_path):
    p = str(tmp_path / "cube_z.fbx")
    _cube_fbx(p, compress=True)
    scene = import_fbx(p)
    assert int(scene.num_triangles) == 5


def test_fbx_transforms(tmp_path):
    """90-degree Y rotation + scale 2 + translation: positions transformed,
    normals rotated (NOT scaled) — the inverse-transpose rule the glTF
    importer got wrong once (ADVICE r2 #2)."""
    p = str(tmp_path / "cube_t.fbx")
    _cube_fbx(p, rotate_deg=90.0, scale=2.0, translate=(10.0, 0.0, 0.0))
    scene = import_fbx(p)
    pos = np.asarray(scene.positions).reshape(-1, 3)
    # original x in [-1,1] scaled by 2, rotated y-90: z -> x ... just check
    # the centroid moved to ~(10,0,0) and extent doubled
    assert abs(pos[:, 0].mean() - 10.0) < 1.0
    ext = pos.max(0) - pos.min(0)
    assert ext.max() > 3.5  # 2x scale of the 2-unit cube
    nrm = np.asarray(scene.normals).reshape(-1, 3)
    ln = np.linalg.norm(nrm, axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)  # unit despite scale
    # +z normal rotated by +90 deg about y -> +x
    assert abs(nrm[:, 0].mean() - 1.0) < 1e-3


def test_fbx_renders(tmp_path):
    """End-to-end: the imported scene renders through the rasterizer."""
    from rtsdm_tpu.ops.raster import rasterize

    p = str(tmp_path / "cube.fbx")
    _cube_fbx(p)
    scene = import_fbx(p)
    out = rasterize(scene.camera.view_proj_mat, scene.positions,
                    width=64, height=64)
    assert int((np.asarray(out["tri_id"]) >= 0).sum()) > 0


ASCII_CUBE = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
    FBXVersion: 7400
}
Objects:  {
    Geometry: 1001, "Geometry::cube", "Mesh" {
        Vertices: *12 {
            a: -1,-1,0,1,-1,0,1,1,0,-1,1,0
        }
        PolygonVertexIndex: *4 {
            a: 0,1,2,-4
        }
        LayerElementNormal: 0 {
            MappingInformationType: "ByPolygonVertex"
            ReferenceInformationType: "Direct"
            Normals: *12 {
                a: 0,0,1.0,0,0,1.0,0,0,1.0,0,0,1.0
            }
        }
    }
    Model: 2001, "Model::cube", "Mesh" {
        Properties70:  {
            P: "Lcl Translation", "Lcl Translation", "", "A",5.0,0,0
        }
    }
    Material: 3001, "Material::m", "" {
        Properties70:  {
            P: "DiffuseColor", "Color", "", "A",0.1,0.2,0.3
        }
    }
}
Connections:  {
    C: "OO",1001,2001
    C: "OO",3001,2001
}
"""


def test_fbx_ascii_import(tmp_path):
    p = tmp_path / "a.fbx"
    p.write_text(ASCII_CUBE)
    scene = import_fbx(str(p))
    assert int(scene.num_triangles) == 2  # one quad fan-triangulated
    pos = np.asarray(scene.positions).reshape(-1, 3)
    assert abs(pos[:, 0].mean() - 5.0) < 1e-5  # Lcl Translation applied
    np.testing.assert_allclose(np.asarray(scene.mat_base_color)[0],
                               [0.1, 0.2, 0.3], atol=1e-6)


def test_fbx_rejects_garbage(tmp_path):
    p = tmp_path / "a.fbx"
    p.write_text("this is not an fbx file at all")
    with pytest.raises(ValueError):
        import_fbx(str(p))


def test_fbx_load_any_dispatch(tmp_path):
    from rtsdm_tpu.scene.importers import load_any

    p = str(tmp_path / "cube.fbx")
    _cube_fbx(p)
    scene = load_any(p)
    assert int(scene.num_triangles) == 5


def test_fbx_by_control_point_layers(tmp_path):
    """ByVertice / ByControlPoint layers carry one value per control point;
    the importer must expand them through the polygon-vertex -> control-point
    index array (they were silently discarded before)."""
    verts = np.array([
        -1, -1, -1,  1, -1, -1,  1, 1, -1,  -1, 1, -1,
        -1, -1, 1,   1, -1, 1,   1, 1, 1,   -1, 1, 1,
    ], np.float64)
    v8 = verts.reshape(8, 3)
    pvi = np.array([0, 1, 2, -4, 4, 5, 6, -8], np.int32)  # two quads
    # per-control-point normal: the normalized vertex position
    nrm_cp = (v8 / np.linalg.norm(v8, axis=1, keepdims=True)).ravel()
    uv_cp = ((v8[:, :2] + 1.0) / 2.0).ravel()
    geo = _emit_tree("Geometry", [1001, "Geometry::cube", "Mesh"], [
        _emit_tree("Vertices", [verts]),
        _emit_tree("PolygonVertexIndex", [pvi]),
        _emit_tree("LayerElementNormal", [0], [
            _emit_tree("MappingInformationType", ["ByVertice"]),
            _emit_tree("ReferenceInformationType", ["Direct"]),
            _emit_tree("Normals", [nrm_cp]),
        ]),
        _emit_tree("LayerElementUV", [0], [
            _emit_tree("MappingInformationType", ["ByControlPoint"]),
            _emit_tree("ReferenceInformationType", ["Direct"]),
            _emit_tree("UV", [uv_cp]),
        ]),
    ])
    model = _emit_tree("Model", [2001, "Model::cube", "Mesh"], [
        _emit_tree("Properties70", children=[])])
    objects = _emit_tree("Objects", children=[geo, model])
    conns = _emit_tree("Connections", children=[
        _emit_tree("C", ["OO", 1001, 2001])])
    p = str(tmp_path / "bycp.fbx")
    write_fbx(p, [objects, conns])

    scene = import_fbx(p)
    assert int(scene.num_triangles) == 4
    pos = np.asarray(scene.positions)          # [T,3,3]
    nrm = np.asarray(scene.normals)
    uv = np.asarray(scene.texcoords)
    # per corner: normal == normalize(position), uv == (pos.xy+1)/2
    # (morton sort permutes triangles, so compare corner-wise)
    exp_n = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    np.testing.assert_allclose(nrm, exp_n, atol=1e-5)
    np.testing.assert_allclose(uv, (pos[..., :2] + 1.0) / 2.0, atol=1e-5)
