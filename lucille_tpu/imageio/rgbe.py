"""Radiance RGBE (.hdr) reader/writer with RLE scanlines.

Equivalent capability to the reference's rgbe codec (src/imageio/rgbe.c,
Bruce Walter's classic implementation of Greg Ward's format): shared
8-bit exponent per pixel, new-style RLE scanline encoding, minimal
header.  This is a fresh NumPy-vectorized implementation of the published
format (header "#?RADIANCE", FORMAT=32-bit_rle_rgbe, "-Y H +X W"
scanline order: row 0 is the top of the image).
"""

from __future__ import annotations

import numpy as np


def float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) float -> (..., 4) uint8 RGBE (shared-exponent encode)."""
    rgb = np.asarray(rgb, dtype=np.float64)
    out = np.zeros(rgb.shape[:-1] + (4,), dtype=np.uint8)
    v = rgb.max(axis=-1)
    pos = v >= 1e-32
    # frexp: v = m * 2^e with m in [0.5, 1)
    m, e = np.frexp(np.where(pos, v, 1.0))
    scale = m * 256.0 / np.where(pos, v, 1.0)
    enc = np.clip(rgb * scale[..., None], 0.0, 255.0).astype(np.uint8)
    out[..., :3] = np.where(pos[..., None], enc, 0)
    out[..., 3] = np.where(pos, (e + 128).astype(np.uint8), 0)
    return out


def rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 RGBE -> (..., 3) float32."""
    rgbe = np.asarray(rgbe, dtype=np.uint8)
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - (128 + 8)), 0.0)
    return (rgbe[..., :3].astype(np.float32) * scale[..., None].astype(np.float32))


def _rle_encode_component(comp: np.ndarray) -> bytes:
    """New-style RLE for one scanline component (uint8 vector)."""
    out = bytearray()
    n = len(comp)
    i = 0
    while i < n:
        # find a run of >= 4 identical bytes
        run_start = i
        run_len = 1
        while run_start + run_len < n and run_len < 127 and comp[run_start + run_len] == comp[run_start]:
            run_len += 1
        if run_len >= 4:
            out.append(128 + run_len)
            out.append(int(comp[run_start]))
            i += run_len
        else:
            # literal: scan forward until a >=4 run starts or 128 bytes
            j = i
            while j < n and j - i < 128:
                # does a run of 4 start at j?
                if j + 3 < n and comp[j] == comp[j + 1] == comp[j + 2] == comp[j + 3]:
                    break
                j += 1
            cnt = j - i
            if cnt == 0:
                cnt = 1
                j = i + 1
            out.append(cnt)
            out.extend(comp[i:j].tobytes())
            i = j
    return bytes(out)


def write_hdr(path, image: np.ndarray, software: str = "lucille_tpu") -> None:
    """Write (H, W, 3) float image as RLE RGBE .hdr.

    Row 0 is written as the TOP scanline ("-Y H +X W"), matching the
    reference hdr driver's raster order (hdrdrv.c buffers pixels at
    y*width+x and streams rows in order).
    """
    image = np.asarray(image)
    h, w = image.shape[:2]
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\n")
        f.write(f"SOFTWARE={software}\n".encode())
        f.write(b"FORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        rgbe = float_to_rgbe(image[..., :3])
        if w < 8 or w > 0x7FFF:
            f.write(rgbe.tobytes())  # flat format for unencodable widths
            return
        for y in range(h):
            f.write(bytes([2, 2, (w >> 8) & 0xFF, w & 0xFF]))
            for c in range(4):
                f.write(_rle_encode_component(rgbe[y, :, c]))


def read_hdr(path) -> np.ndarray:
    """Read a Radiance .hdr into (H, W, 3) float32 (top row first)."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends at the first blank line; the next line is the resolution
    pos = 0
    lines = []
    while True:
        nl = data.index(b"\n", pos)
        line = data[pos:nl]
        pos = nl + 1
        if line == b"":
            break
        lines.append(line)
    if not lines or not lines[0].startswith(b"#?"):
        raise ValueError("not a Radiance file")
    res = data[pos : data.index(b"\n", pos)]
    pos = data.index(b"\n", pos) + 1
    parts = res.split()
    if len(parts) != 4 or parts[0] != b"-Y" or parts[2] != b"+X":
        raise ValueError(f"unsupported resolution line: {res!r}")
    h, w = int(parts[1]), int(parts[3])

    buf = np.frombuffer(data, dtype=np.uint8, offset=pos)
    img = np.zeros((h, w, 4), dtype=np.uint8)
    bi = 0
    for y in range(h):
        if w < 8 or w > 0x7FFF or buf[bi] != 2 or buf[bi + 1] != 2:
            # flat (possibly old-style RLE, not produced by us or lucille)
            row = buf[bi : bi + w * 4].reshape(w, 4)
            img[y] = row
            bi += w * 4
            continue
        assert (int(buf[bi + 2]) << 8 | int(buf[bi + 3])) == w, "scanline width mismatch"
        bi += 4
        for c in range(4):
            x = 0
            while x < w:
                code = int(buf[bi])
                bi += 1
                if code > 128:  # run
                    cnt = code - 128
                    img[y, x : x + cnt, c] = buf[bi]
                    bi += 1
                    x += cnt
                else:  # literal
                    img[y, x : x + code, c] = buf[bi : bi + code]
                    bi += code
                    x += code
    return rgbe_to_float(img)
