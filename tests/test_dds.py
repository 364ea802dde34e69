"""DDS reader (utils/image_io.load_dds) — the Utils.Image DDS row
(reference Utils/Image/ImageIO.cpp, DirectXTex-backed). Files are
synthesized in-test: known-value headers + hand-encoded BC blocks."""
import struct

import numpy as np
import pytest

from rtsdm_tpu.utils.image_io import load_dds


def _header(h, w, fourcc=b"", rgb_bits=0, masks=(0, 0, 0, 0)):
    pf_flags = 0x4 if fourcc else (0x41 if masks[3] else 0x40)
    pf = struct.pack("<II4sIIIII", 32, pf_flags, fourcc, rgb_bits, *masks)
    # magic + size,flags,h,w,pitch,depth,mips + reserved1[11] + pf + caps
    out = b"DDS " + struct.pack("<IIIIIII", 124, 0x1007, h, w, 0, 0, 0)
    out += b"\0" * 44                    # reserved1[11]
    out += pf
    out += struct.pack("<IIIII", 0x1000, 0, 0, 0, 0)  # caps
    assert len(out) == 128
    return out


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_bytes(payload)
    return str(p)


def test_uncompressed_rgba(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    # masks say: byte0=R, byte1=G, byte2=B, byte3=A
    data = img.tobytes()
    path = _write(tmp_path, "u.dds",
                  _header(4, 6, rgb_bits=32,
                          masks=(0xFF, 0xFF00, 0xFF0000, 0xFF000000)) + data)
    out = load_dds(path)
    assert out.shape == (4, 6, 4)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_bc1_two_color_block(tmp_path):
    # c0 = pure red (0xF800), c1 = pure blue (0x001F), c0 > c1 -> 4-color
    # indices: texel i uses palette entry i % 4
    idx = 0
    for i in range(16):
        idx |= (i % 4) << (2 * i)
    block = struct.pack("<HHI", 0xF800, 0x001F, idx)
    path = _write(tmp_path, "bc1.dds", _header(4, 4, fourcc=b"DXT1") + block)
    out = load_dds(path)
    assert out.shape == (4, 4, 4)
    red = np.asarray([1.0, 0, 0])
    blue = np.asarray([0, 0, 1.0])
    pal = [red, blue, (2 * red + blue) / 3, (red + 2 * blue) / 3]
    for i in range(16):
        np.testing.assert_allclose(out[i // 4, i % 4, :3], pal[i % 4],
                                   atol=1e-6)
    assert (out[..., 3] == 1.0).all()


def test_bc1_three_color_transparent(tmp_path):
    # c0 <= c1 -> 3-color mode; index 3 = transparent black
    idx = 0b11  # texel 0 -> index 3, rest 0
    block = struct.pack("<HHI", 0x001F, 0xF800, idx)
    path = _write(tmp_path, "bc1t.dds", _header(4, 4, fourcc=b"DXT1") + block)
    out = load_dds(path)
    assert out[0, 0, 3] == 0.0 and (out[0, 0, :3] == 0.0).all()
    assert out[0, 1, 3] == 1.0


def test_bc3_alpha_gradient(tmp_path):
    # alpha block: a0=255 > a1=0 -> 8-interp palette; texel i uses idx i % 8
    bits = 0
    for i in range(16):
        bits |= (i % 8) << (3 * i)
    ablock = bytes([255, 0]) + bits.to_bytes(6, "little")
    cblock = struct.pack("<HHI", 0xF800, 0xF800, 0)  # solid red
    path = _write(tmp_path, "bc3.dds",
                  _header(4, 4, fourcc=b"DXT5") + ablock + cblock)
    out = load_dds(path)
    pal = np.asarray([255, 0] + [((7 - i) * 255 + i * 0) / 7.0
                                 for i in range(1, 7)]) / 255.0
    for i in range(16):
        np.testing.assert_allclose(out[i // 4, i % 4, 3], pal[i % 8],
                                   atol=1e-6)
    np.testing.assert_allclose(out[..., 0], 1.0, atol=2e-2)  # red channel


def test_bc5_two_channel(tmp_path):
    # two BC4 blocks: R constant 100, G constant 200 (a0=a1 -> palette[0])
    r = bytes([100, 100]) + b"\0" * 6
    g = bytes([200, 200]) + b"\0" * 6
    path = _write(tmp_path, "bc5.dds", _header(4, 4, fourcc=b"ATI2") + r + g)
    out = load_dds(path)
    assert out.shape == (4, 4, 2)
    np.testing.assert_allclose(out[..., 0], 100 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], 200 / 255.0, atol=1e-6)


def test_dx10_header_bc1(tmp_path):
    idx = 0
    block = struct.pack("<HHI", 0xF800, 0x001F, idx)
    dx10 = struct.pack("<IIIII", 71, 3, 0, 1, 0)  # BC1_UNORM, tex2d
    path = _write(tmp_path, "dx10.dds",
                  _header(4, 4, fourcc=b"DX10") + dx10 + block)
    out = load_dds(path)
    np.testing.assert_allclose(out[0, 0, :3], [1, 0, 0], atol=1e-6)


def test_not_dds_raises(tmp_path):
    path = _write(tmp_path, "no.dds", b"PNG whatever")
    with pytest.raises(ValueError):
        load_dds(path)


def test_obj_mtl_with_dds_texture(tmp_path):
    """End-to-end: an OBJ whose MTL references a BC1 DDS — the importer
    decodes it into the page-stack texture atlas."""
    idx = 0  # every texel palette entry 0 = c0 = pure red
    block = struct.pack("<HHI", 0xF800, 0x001F, idx)
    (tmp_path / "tex.dds").write_bytes(_header(4, 4, fourcc=b"DXT1") + block)
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 1 1 1\nmap_Kd tex.dds\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\nusemtl red\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    from rtsdm_tpu.scene.importers import load_any
    scene = load_any(str(tmp_path / "q.obj"))
    assert scene.num_triangles == 2
    assert scene.tex_pages is not None
    page = np.asarray(scene.tex_pages[int(scene.mat_tex[0])])
    np.testing.assert_allclose(page[..., 0].max(), 1.0, atol=1e-3)
    assert page[..., 2].mean() < 0.1  # red, not blue
