"""Image I/O: PNG (via PIL) and OpenEXR float images (self-contained
uncompressed scanline codec — no external EXR dependency).

Reference parity: Falcor's image I/O lives in Core/API/Formats +
Utils/Image/ImageIO.cpp (PNG/EXR/DDS via stb/tinyexr); FrameCapture writes
EXR for HDR outputs (Mogwai FrameCapture). DDS reading (the dominant Falcor
asset texture format) is implemented here as a host-side decode —
uncompressed RGBA/BGRA plus BC1-BC5 block decompression, vectorized numpy —
since TPU has no sampler hardware to feed compressed blocks to; textures
enter the page-stack atlas as plain float arrays either way.
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PNG (PIL-backed)
# ---------------------------------------------------------------------------


def save_png(path: str, img: np.ndarray):
    """[H,W], [H,W,3] or [H,W,4] float 0..1 or uint8 -> PNG."""
    from PIL import Image
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if a.ndim == 2:
        Image.fromarray(a, "L").save(path)
    else:
        Image.fromarray(a, "RGBA" if a.shape[-1] == 4 else "RGB").save(path)


def load_png(path: str) -> np.ndarray:
    """PNG/JPEG/BMP -> float32 [H,W,C] in 0..1."""
    from PIL import Image
    with Image.open(path) as im:
        a = np.asarray(im.convert("RGBA" if "A" in im.getbands() else "RGB"))
    return a.astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# EXR (uncompressed scanline, float32 or half)
# ---------------------------------------------------------------------------

_EXR_MAGIC = 20000630
_PT_HALF, _PT_FLOAT = 1, 2


def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(payload)) + payload)


def save_exr(path: str, img: np.ndarray, half: bool = False):
    """[H,W] or [H,W,C<=4] float -> uncompressed scanline EXR.

    Channels written in the OpenEXR alphabetical convention
    (A,B,G,R subset by count: 1->Y, 3->BGR, 4->ABGR)."""
    a = np.asarray(img, np.float32)
    if a.ndim == 2:
        a = a[..., None]
    h, w, c = a.shape
    names = {1: ["Y"], 2: ["U", "Y"], 3: ["B", "G", "R"],
             4: ["A", "B", "G", "R"]}[c]
    # map channel name -> source plane (RGB order in the input array)
    src = {1: [0], 2: [1, 0], 3: [2, 1, 0], 4: [3, 2, 1, 0]}[c]
    ptype = _PT_HALF if half else _PT_FLOAT
    psize = 2 if half else 4

    chan = b""
    for n in names:
        chan += (n.encode() + b"\0" + struct.pack("<i", ptype)
                 + b"\0\0\0" + b"\0" + struct.pack("<ii", 1, 1))
    chan += b"\0"

    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr = struct.pack("<ii", _EXR_MAGIC, 2)
    hdr += _attr("channels", "chlist", chan)
    hdr += _attr("compression", "compression", b"\0")          # NO_COMPRESSION
    hdr += _attr("dataWindow", "box2i", box)
    hdr += _attr("displayWindow", "box2i", box)
    hdr += _attr("lineOrder", "lineOrder", b"\0")              # INCREASING_Y
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\0"

    line_bytes = 8 + c * w * psize
    table_pos = len(hdr)
    data_pos = table_pos + 8 * h
    offsets = struct.pack("<%dQ" % h,
                          *[data_pos + y * line_bytes for y in range(h)])

    dt = np.float16 if half else np.float32
    rows = []
    for y in range(h):
        row = np.concatenate([a[y, :, s].astype(dt) for s in src])
        rows.append(struct.pack("<ii", y, c * w * psize) + row.tobytes())
    with open(path, "wb") as f:
        f.write(hdr + offsets + b"".join(rows))


def load_exr(path: str) -> np.ndarray:
    """Uncompressed scanline EXR -> float32 [H,W,C] (RGB(A) order)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, _ver = struct.unpack_from("<ii", buf, 0)
    if magic != _EXR_MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    pos = 8
    channels = []  # (name, ptype)
    data_win = None
    compression = 0
    while buf[pos] != 0:
        e = buf.index(b"\0", pos)
        name = buf[pos:e].decode()
        pos = e + 1
        e = buf.index(b"\0", pos)
        pos = e + 1
        (alen,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos:pos + alen]
        pos += alen
        if name == "channels":
            p = 0
            while payload[p] != 0:
                ce = payload.index(b"\0", p)
                cname = payload[p:ce].decode()
                (ptype,) = struct.unpack_from("<i", payload, ce + 1)
                channels.append((cname, ptype))
                p = ce + 1 + 16
        elif name == "dataWindow":
            data_win = struct.unpack("<4i", payload)
        elif name == "compression":
            compression = payload[0]
    pos += 1  # header terminator
    if compression != 0:
        raise ValueError(f"{path}: only uncompressed EXR supported "
                         f"(compression={compression})")
    x0, y0, x1, y1 = data_win
    w, h = x1 - x0 + 1, y1 - y0 + 1
    c = len(channels)
    pos += 8 * h  # skip the offset table
    planes = {n: np.empty((h, w), np.float32) for n, _ in channels}
    for _ in range(h):
        y, _size = struct.unpack_from("<ii", buf, pos)
        pos += 8
        for n, ptype in channels:  # stored in header (alphabetical) order
            psize = 2 if ptype == _PT_HALF else 4
            dt = np.float16 if ptype == _PT_HALF else np.float32
            planes[n][y - y0] = np.frombuffer(
                buf, dt, w, pos).astype(np.float32)
            pos += w * psize
    order = {1: ["Y"], 2: ["Y", "U"], 3: ["R", "G", "B"],
             4: ["R", "G", "B", "A"]}.get(c)
    if order and all(n in planes for n in order):
        return np.stack([planes[n] for n in order], axis=-1)
    return np.stack([planes[n] for n, _ in channels], axis=-1)


def save_image(path: str, img: np.ndarray):
    """Dispatch by extension (.png/.jpg -> LDR, .exr -> HDR, .npy -> raw)."""
    low = path.lower()
    if low.endswith(".exr"):
        save_exr(path, np.asarray(img, np.float32))
    elif low.endswith(".npy"):
        np.save(path, np.asarray(img))
    else:
        save_png(path, np.asarray(img))


def load_image(path: str) -> np.ndarray:
    low = path.lower()
    if low.endswith(".exr"):
        return load_exr(path)
    if low.endswith(".npy"):
        return np.load(path)
    if low.endswith(".dds"):
        return load_dds(path)
    return load_png(path)


# ---------------------------------------------------------------------------
# DDS (DirectDraw Surface) reader — uncompressed + BC1/BC2/BC3/BC4/BC5.
# Reference: Utils/Image/ImageIO.cpp (DirectXTex-backed); layout per the
# DDS_HEADER spec. Vectorized numpy block decode, top mip only.
# ---------------------------------------------------------------------------

def _rgb565(c):
    r = ((c >> 11) & 0x1F).astype(np.float32) / 31.0
    g = ((c >> 5) & 0x3F).astype(np.float32) / 63.0
    b = (c & 0x1F).astype(np.float32) / 31.0
    return np.stack([r, g, b], -1)


def _bc1_colors(blocks, force_four=False):
    """blocks: [N,8] uint8 -> [N,16,4] float colors (row-major texels)."""
    n = blocks.shape[0]
    c0 = blocks[:, 0].astype(np.uint16) | (blocks[:, 1].astype(np.uint16) << 8)
    c1 = blocks[:, 2].astype(np.uint16) | (blocks[:, 3].astype(np.uint16) << 8)
    idx = (blocks[:, 4:8].astype(np.uint32)
           * (1 << (8 * np.arange(4, dtype=np.uint32)))).sum(1)
    sel = (idx[:, None] >> (2 * np.arange(16, dtype=np.uint32))[None]) & 3
    p0, p1 = _rgb565(c0), _rgb565(c1)
    four = force_four | (c0 > c1)
    f = four[:, None].astype(np.float32)
    p2 = (2 * p0 + p1) / 3 * f + (p0 + p1) / 2 * (1 - f)
    p3 = (p0 + 2 * p1) / 3 * f  # 3-color mode: p3 = transparent black
    pal = np.stack([p0, p1, p2, p3], 1)                       # [N,4,3]
    cols = np.take_along_axis(pal, sel[..., None].astype(np.int64), 1)
    alpha = np.where(four[:, None] | (sel != 3), 1.0, 0.0).astype(np.float32)
    return np.concatenate([cols, alpha[..., None]], -1)       # [N,16,4]


def _bc4_channel(blocks8):
    """blocks8: [N,8] uint8 (one BC4/alpha block) -> [N,16] float."""
    a0 = blocks8[:, 0].astype(np.float32)
    a1 = blocks8[:, 1].astype(np.float32)
    bits = np.zeros(blocks8.shape[0], np.uint64)
    for i in range(6):
        bits |= blocks8[:, 2 + i].astype(np.uint64) << np.uint64(8 * i)
    sel = (bits[:, None] >> (3 * np.arange(16, dtype=np.uint64))[None]
           ).astype(np.int64) & 7
    pal = np.zeros((blocks8.shape[0], 8), np.float32)
    pal[:, 0] = a0
    pal[:, 1] = a1
    seven = a0 > a1
    for i in range(1, 7):
        pal[:, 1 + i] = np.where(
            seven, ((7 - i) * a0 + i * a1) / 7.0,
            0.0)
    for i in range(1, 5):
        pal[:, 1 + i] = np.where(seven, pal[:, 1 + i],
                                 ((5 - i) * a0 + i * a1) / 5.0)
    pal[:, 6] = np.where(seven, pal[:, 6], 0.0)
    pal[:, 7] = np.where(seven, pal[:, 7], 255.0)
    return np.take_along_axis(pal, sel, 1) / 255.0


def _blocks_to_image(tex, h, w):
    """[N,16,C] per-block texels -> [h,w,C]."""
    bh, bw = (h + 3) // 4, (w + 3) // 4
    c = tex.shape[-1]
    img = tex.reshape(bh, bw, 4, 4, c).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(img.reshape(bh * 4, bw * 4, c))[:h, :w]


def load_dds(path: str) -> np.ndarray:
    """DDS -> float32 [H,W,C] in 0..1 (top mip).  Supports uncompressed
    RGBA8/BGRA8/luminance and BC1/BC2/BC3 (color+alpha), BC4 (1ch),
    BC5 (2ch)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"DDS ":
        raise ValueError(f"{path}: not a DDS file")
    (hsize, flags, h, w) = struct.unpack_from("<IIII", raw, 4)
    pf_flags, fourcc = struct.unpack_from("<II", raw, 80)
    rgb_bits, rmask, gmask, bmask, amask = struct.unpack_from("<IIIII",
                                                              raw, 88)
    off = 4 + 124
    cc = raw[84:88]
    if cc == b"DX10":
        (dxgi,) = struct.unpack_from("<I", raw, off)
        off += 20
        dxgi_map = {71: b"DXT1", 74: b"DXT3", 77: b"DXT5",
                    80: b"ATI1", 83: b"ATI2", 28: b"", 87: b""}
        if dxgi in (28, 29):            # R8G8B8A8
            cc, pf_flags, rgb_bits = b"", 0x41, 32
            rmask, gmask, bmask, amask = (0xFF, 0xFF00, 0xFF0000,
                                          0xFF000000)
        elif dxgi in (87, 88):          # B8G8R8A8
            cc, pf_flags, rgb_bits = b"", 0x41, 32
            rmask, gmask, bmask, amask = (0xFF0000, 0xFF00, 0xFF,
                                          0xFF000000)
        elif dxgi in dxgi_map:
            cc = dxgi_map[dxgi]
        else:
            raise ValueError(f"{path}: unsupported DXGI format {dxgi}")
    bh, bw = (h + 3) // 4, (w + 3) // 4
    n = bh * bw
    if cc in (b"DXT1",):
        blocks = np.frombuffer(raw, np.uint8, n * 8, off).reshape(n, 8)
        return _blocks_to_image(_bc1_colors(blocks), h, w)
    if cc in (b"DXT3",):
        blk = np.frombuffer(raw, np.uint8, n * 16, off).reshape(n, 16)
        a4 = np.zeros((n, 16), np.float32)
        for i in range(8):
            byte = blk[:, i].astype(np.uint16)
            a4[:, 2 * i] = (byte & 0xF) / 15.0
            a4[:, 2 * i + 1] = (byte >> 4) / 15.0
        tex = _bc1_colors(blk[:, 8:], force_four=True)
        tex[..., 3] = a4
        return _blocks_to_image(tex, h, w)
    if cc in (b"DXT5",):
        blk = np.frombuffer(raw, np.uint8, n * 16, off).reshape(n, 16)
        tex = _bc1_colors(blk[:, 8:], force_four=True)
        tex[..., 3] = _bc4_channel(blk[:, :8])
        return _blocks_to_image(tex, h, w)
    if cc in (b"ATI1", b"BC4U"):
        blk = np.frombuffer(raw, np.uint8, n * 8, off).reshape(n, 8)
        return _blocks_to_image(_bc4_channel(blk)[..., None], h, w)[..., 0]
    if cc in (b"ATI2", b"BC5U"):
        blk = np.frombuffer(raw, np.uint8, n * 16, off).reshape(n, 16)
        r = _bc4_channel(blk[:, :8])
        g = _bc4_channel(blk[:, 8:])
        return _blocks_to_image(np.stack([r, g], -1), h, w)
    if pf_flags & 0x40 or pf_flags & 0x41:   # uncompressed RGB(A)
        bypp = rgb_bits // 8
        data = np.frombuffer(raw, np.uint8, h * w * bypp, off)
        px = data.reshape(h, w, bypp).astype(np.uint32)
        word = np.zeros((h, w), np.uint32)
        for i in range(bypp):
            word |= px[..., i] << np.uint32(8 * i)

        def chan(mask):
            if not mask:
                return np.ones((h, w), np.float32)
            shift = (mask & -mask).bit_length() - 1
            return ((word & np.uint32(mask)) >> np.uint32(shift)
                    ).astype(np.float32) / float(mask >> shift)
        out = [chan(rmask), chan(gmask), chan(bmask)]
        if amask:
            out.append(chan(amask))
        return np.stack(out, -1)
    if pf_flags & 0x20000:                   # luminance
        data = np.frombuffer(raw, np.uint8, h * w, off)
        return data.reshape(h, w).astype(np.float32) / 255.0
    raise ValueError(f"{path}: unsupported DDS pixel format")
