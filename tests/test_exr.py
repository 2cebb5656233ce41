"""OpenEXR codec tests: round-trip, format structure, driver dispatch.

The reference's openexrdrv.c writes via libIlmImf; our codec emits the
file format directly (imageio/exr.py), so these tests check both value
round-trips and on-disk structure against the OpenEXR 2.0 spec.
"""

import struct

import numpy as np

from lucille_tpu.imageio.exr import read_exr, write_exr
from lucille_tpu.imageio.loader import load_image, save_image


def _test_image(h=7, w=13):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, (h, w, 3)).astype(np.float32)
    img[0, 0] = [0.0, 1.0, 65504.0]  # half-range extremes
    return img


class TestRoundTrip:
    def test_float_exact(self, tmp_path):
        img = _test_image()
        p = tmp_path / "t.exr"
        write_exr(p, img, pixel_type="float")
        out = read_exr(p)
        np.testing.assert_array_equal(out, img)

    def test_half_quantized(self, tmp_path):
        img = _test_image()
        p = tmp_path / "t.exr"
        write_exr(p, img)  # default HALF
        out = read_exr(p)
        np.testing.assert_array_equal(out, img.astype(np.float16).astype(np.float32))

    def test_loader_dispatch(self, tmp_path):
        img = _test_image(4, 4)
        p = tmp_path / "d.exr"
        save_image(p, img)
        out = load_image(p)
        assert out.shape == (4, 4, 3)
        assert np.abs(out - img).max() < 2e-3

    def test_negative_and_inf(self, tmp_path):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = [-1.5, np.inf, 0.25]
        p = tmp_path / "n.exr"
        write_exr(p, img, pixel_type="float")
        np.testing.assert_array_equal(read_exr(p), img)


class TestFormat:
    def test_magic_and_version(self, tmp_path):
        p = tmp_path / "m.exr"
        write_exr(p, np.zeros((2, 3, 3), np.float32))
        buf = p.read_bytes()
        magic, version = struct.unpack_from("<ii", buf, 0)
        assert magic == 20000630
        assert version == 2

    def test_required_attributes_present(self, tmp_path):
        p = tmp_path / "a.exr"
        write_exr(p, np.zeros((2, 3, 3), np.float32))
        buf = p.read_bytes()
        for attr in (
            b"channels",
            b"compression",
            b"dataWindow",
            b"displayWindow",
            b"lineOrder",
            b"pixelAspectRatio",
            b"screenWindowCenter",
            b"screenWindowWidth",
        ):
            assert attr + b"\0" in buf

    def test_channels_alphabetical(self, tmp_path):
        p = tmp_path / "c.exr"
        write_exr(p, np.zeros((1, 1, 3), np.float32))
        buf = p.read_bytes()
        assert buf.index(b"B\0") < buf.index(b"G\0") < buf.index(b"R\0")

    def test_rejects_non_exr(self, tmp_path):
        p = tmp_path / "bad.exr"
        p.write_bytes(b"not an exr file at all....")
        try:
            read_exr(p)
            assert False, "should raise"
        except ValueError as e:
            assert "not an OpenEXR" in str(e)


class TestDriver:
    def test_openexr_driver_writes_exr(self, tmp_path):
        from lucille_tpu.display.drivers import get_display_driver

        drv = get_display_driver("openexr")
        out = tmp_path / "frame.hdr"  # driver forces .exr
        drv.open(str(out), 4, 2)
        tile = np.full((2, 4, 3), 0.5, np.float32)
        drv.write(0, 0, tile)
        drv.close()
        exr = tmp_path / "frame.exr"
        assert exr.exists()
        img = read_exr(exr)
        assert img.shape == (2, 4, 3)
        np.testing.assert_allclose(img, 0.5)


class TestCompression:
    """ZIP/ZIPS/RLE scanline codecs (the compressions a DCC most
    commonly saves; the reference links full OpenEXR, openexrdrv.c)."""

    def test_compressed_round_trip(self, tmp_path):
        rng = np.random.default_rng(7)
        img = rng.random((37, 53, 3)).astype(np.float32)
        img[5:9] = 0.25  # compressible region exercises the codec path
        for comp in ("rle", "zips", "zip"):
            for pt, tol in (("half", 2e-3), ("float", 0.0)):
                p = tmp_path / f"t_{comp}_{pt}.exr"
                write_exr(p, img, pixel_type=pt, compression=comp)
                back = read_exr(p)
                assert back.shape == img.shape
                assert np.abs(back - img).max() <= tol

    def test_zip_is_smaller_and_flagged(self, tmp_path):
        img = np.full((32, 64, 3), 0.125, np.float32)
        a, b = tmp_path / "n.exr", tmp_path / "z.exr"
        write_exr(a, img)
        write_exr(b, img, compression="zip")
        assert b.stat().st_size < a.stat().st_size
        import struct as _s

        buf = b.read_bytes()
        i = buf.index(b"compression\x00compression\x00")
        (sz,) = _s.unpack_from("<i", buf, i + 24)
        assert buf[i + 28] == 3  # ZIP_COMPRESSION

    def test_unfilter_inverts_filter(self):
        from lucille_tpu.imageio.exr import _exr_filter, _exr_unfilter

        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 999, dtype=np.uint8).tobytes()
        assert _exr_unfilter(_exr_filter(data)) == data

    def test_rle_codec_inverts(self):
        from lucille_tpu.imageio.exr import _rle_decode, _rle_encode

        data = b"\x00" * 40 + bytes(range(30)) + b"\xff" * 300 + b"ab"
        assert _rle_decode(_rle_encode(data)) == data
