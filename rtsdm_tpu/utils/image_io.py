"""Image I/O: PNG (via PIL) and OpenEXR float images (self-contained
uncompressed scanline codec — no external EXR dependency).

Reference parity: Falcor's image I/O lives in Core/API/Formats +
Utils/Image/ImageIO.cpp (PNG/EXR/DDS via stb/tinyexr); FrameCapture writes
EXR for HDR outputs (Mogwai FrameCapture). DDS block-compressed textures
are out of scope on TPU (no sampler hardware to feed them to) — PNG/EXR/npy
cover capture + load.
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
    return load_png(path)
