"""Blocked-mipmap `.tex` codec (imageio/tex.py).

Format per the reference's spec (texture_loader.c:8-90, header +
row-major 64x64 float4 blocks per miplevel, gzip stream); the
reference's own writer is `#if 0` so round-trips are against our writer
of the same documented layout.
"""

import gzip

import numpy as np
import pytest

from lucille_tpu.imageio.tex import TEXBLOCKSIZE, read_tex, write_tex


@pytest.mark.parametrize("shape", [(64, 64), (100, 180), (256, 512), (7, 5)])
def test_roundtrip(tmp_path, shape):
    rng = np.random.default_rng(42)
    img = rng.random(shape + (3,)).astype(np.float32)
    p = tmp_path / "t.tex"
    write_tex(p, img)
    back = read_tex(p)
    assert back.shape == img.shape
    np.testing.assert_allclose(back, img, rtol=0, atol=0)


def test_mip_level_1_is_box_filtered(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((128, 256, 3)).astype(np.float32)
    p = tmp_path / "t.tex"
    write_tex(p, img)
    m1 = read_tex(p, level=1)
    ref = 0.25 * (
        img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
    )
    assert m1.shape == (64, 128, 3)
    np.testing.assert_allclose(m1, ref, atol=1e-6)


def test_header_layout_matches_reference(tmp_path):
    """Header = int32 [nmiplevels, width, height, nxblocks, nyblocks]
    (write_blockedmipmap, texture_loader.c:719-723)."""
    img = np.zeros((128, 192, 3), np.float32)
    p = tmp_path / "t.tex"
    write_tex(p, img)
    with gzip.open(p, "rb") as f:
        head = np.frombuffer(f.read(20), "<i4")
    nmip, w, h, nxb, nyb = head
    assert (w, h) == (192, 128)
    assert nxb == -(-192 // TEXBLOCKSIZE) and nyb == -(-128 // TEXBLOCKSIZE)
    assert nmip >= 2


def test_loader_dispatch(tmp_path):
    from lucille_tpu.imageio.loader import load_image, save_image

    img = np.random.default_rng(2).random((32, 64, 3)).astype(np.float32)
    p = tmp_path / "u.tex"
    save_image(p, img)
    np.testing.assert_allclose(load_image(p), img)


def test_rejects_garbage(tmp_path):
    p = tmp_path / "bad.tex"
    with gzip.open(p, "wb") as f:
        f.write(b"\x00" * 8)
    with pytest.raises(ValueError):
        read_tex(p)
