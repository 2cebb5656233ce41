"""Minimal OpenEXR scanline codec (pure numpy).

The reference ships an OpenEXR display driver behind ``HAVE_OPENEXR``
(src/display/openexrdrv.c, registered at src/render/render.c:166-234).
This environment has no OpenEXR library, so the codec is implemented
directly: single-part scanline images, NO_COMPRESSION, HALF or FLOAT
RGB channels — the subset lucille's driver emits.  numpy's float16 is
IEEE 754 binary16, i.e. exactly EXR's HALF.

Layout (OpenEXR 2.0 file format):
  magic int32 20000630 | version int32 2 | header attributes
  (name\\0 type\\0 size data)* \\0 | scanline offset table (uint64 per
  block) | blocks of (y int32, bytesize int32, channel-planar pixels).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 20000630
_PIXELTYPE = {"half": 1, "float": 2}
_DTYPE = {1: np.dtype("<f2"), 2: np.dtype("<f4")}


def _attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<i", len(data)) + data


def write_exr(path, img: np.ndarray, pixel_type: str = "half") -> None:
    """Write (H, W, 3) float RGB as a scanline EXR (no compression)."""
    img = np.asarray(img, dtype=np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) image, got {img.shape}")
    H, W, _ = img.shape
    ptype = _PIXELTYPE[pixel_type]
    dt = _DTYPE[ptype]

    # channel list, alphabetical as the format requires: B, G, R
    ch = b""
    for name in (b"B", b"G", b"R"):
        ch += name + b"\0" + struct.pack("<i", ptype) + b"\x01\0\0\0" + struct.pack("<ii", 1, 1)
    ch += b"\0"

    box = struct.pack("<iiii", 0, 0, W - 1, H - 1)
    header = b"".join(
        [
            _attr(b"channels", b"chlist", ch),
            _attr(b"compression", b"compression", b"\0"),  # NO_COMPRESSION
            _attr(b"dataWindow", b"box2i", box),
            _attr(b"displayWindow", b"box2i", box),
            _attr(b"lineOrder", b"lineOrder", b"\0"),  # INCREASING_Y
            _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
            _attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0)),
            _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
            b"\0",
        ]
    )

    pre = 4 + 4 + len(header)
    table_size = 8 * H
    line_bytes = 3 * W * dt.itemsize
    block_size = 8 + line_bytes
    offsets = [pre + table_size + y * block_size for y in range(H)]

    # channel-planar scanlines in B, G, R order
    planar = np.ascontiguousarray(img[:, :, ::-1].transpose(0, 2, 1)).astype(dt)

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, 2))
        f.write(header)
        f.write(np.asarray(offsets, dtype="<u8").tobytes())
        for y in range(H):
            f.write(struct.pack("<ii", y, line_bytes))
            f.write(planar[y].tobytes())


def read_exr(path) -> np.ndarray:
    """Read a single-part NO_COMPRESSION scanline EXR -> (H, W, 3) f32."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an OpenEXR file")
    if version & 0x200:
        raise ValueError(f"{path}: multi-part EXR not supported")
    pos = 8

    channels = []
    compression = None
    dw = None
    while True:
        if buf[pos] == 0:
            pos += 1
            break
        nul = buf.index(b"\0", pos)
        name = buf[pos:nul].decode()
        pos = nul + 1
        nul = buf.index(b"\0", pos)
        typ = buf[pos:nul].decode()
        pos = nul + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        data = buf[pos : pos + size]
        pos += size
        if name == "channels":
            p = 0
            while data[p] != 0:
                cn = data.index(b"\0", p)
                cname = data[p:cn].decode()
                (ptype,) = struct.unpack_from("<i", data, cn + 1)
                channels.append((cname, ptype))
                p = cn + 1 + 16
        elif name == "compression":
            compression = data[0]
        elif name == "dataWindow":
            dw = struct.unpack("<iiii", data)
    if compression != 0:
        raise ValueError(
            f"{path}: compression {compression} not supported (NO_COMPRESSION only)"
        )
    W = dw[2] - dw[0] + 1
    H = dw[3] - dw[1] + 1

    offsets = np.frombuffer(buf, dtype="<u8", count=H, offset=pos)

    planes = {}
    for block in offsets:
        y, _size = struct.unpack_from("<ii", buf, int(block))
        off = int(block) + 8
        for cname, ptype in channels:  # stored in header (alphabetical) order
            dt = _DTYPE[ptype]
            planes.setdefault(cname, [None] * H)[y - dw[1]] = np.frombuffer(
                buf, dtype=dt, count=W, offset=off
            )
            off += W * dt.itemsize

    def plane(cname):
        rows = planes.get(cname)
        if rows is None:
            return np.zeros((H, W), np.float32)
        return np.stack(rows).astype(np.float32)

    return np.stack([plane("R"), plane("G"), plane("B")], axis=-1)
