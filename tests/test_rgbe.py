import numpy as np
import pytest

from lucille_tpu.imageio.rgbe import (
    float_to_rgbe,
    read_hdr,
    rgbe_to_float,
    write_hdr,
)


class TestCodec:
    def test_roundtrip_values(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0.0, 4.0, (8, 16, 3)).astype(np.float32)
        dec = rgbe_to_float(float_to_rgbe(img))
        # shared exponent quantizes to ~1/256 of the max channel
        err = np.abs(dec - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
        assert err.max() < 1.0 / 128.0

    def test_zero_is_exact(self):
        z = np.zeros((2, 2, 3))
        assert (rgbe_to_float(float_to_rgbe(z)) == 0).all()

    def test_tiny_values_flush_to_zero(self):
        t = np.full((1, 1, 3), 1e-40)
        assert (rgbe_to_float(float_to_rgbe(t)) == 0).all()

    def test_large_dynamic_range(self):
        img = np.array([[[1e-3, 1.0, 1e3]]])
        dec = rgbe_to_float(float_to_rgbe(img))
        assert dec[0, 0, 2] == pytest.approx(1e3, rel=0.01)


class TestFileIO:
    def test_write_read_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.uniform(0.0, 2.0, (33, 65, 3)).astype(np.float32)
        p = tmp_path / "t.hdr"
        write_hdr(p, img)
        back = read_hdr(p)
        assert back.shape == img.shape
        err = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
        assert err.max() < 1.0 / 128.0

    def test_rle_runs(self, tmp_path):
        # constant image: heavy RLE; file must be much smaller than flat
        img = np.full((64, 128, 3), 0.5, dtype=np.float32)
        p = tmp_path / "flat.hdr"
        write_hdr(p, img)
        assert p.stat().st_size < 64 * 128 * 4 / 10
        back = read_hdr(p)
        np.testing.assert_allclose(back, img, atol=1 / 256)

    def test_narrow_image_flat_format(self, tmp_path):
        img = np.random.default_rng(2).uniform(0, 1, (4, 4, 3))
        p = tmp_path / "narrow.hdr"
        write_hdr(p, img)
        back = read_hdr(p)
        assert back.shape == (4, 4, 3)

    def test_reads_reference_lucille_output(self):
        """Cross-validate against an HDR written by CPU-lucille itself."""
        import os

        golden = os.path.join(os.path.dirname(__file__), "golden", "ao_80x60_ref.hdr")
        if not os.path.exists(golden):
            pytest.skip("golden unavailable")
        img = read_hdr(golden)
        assert img.shape == (60, 80, 3)
        assert 0.0 <= img.min() and img.max() <= 1.5
        assert 0.1 < img.mean() < 0.8


class TestNativeCodec:
    """The C++ RLE codec (native/rgbe_codec.cpp) must be byte-identical
    to the Python encoder and invert it exactly."""

    def test_encode_identical_and_decode_inverts(self):
        import numpy as np

        from lucille_tpu.imageio.rgbe import (
            _native_decode,
            _native_encode,
            _rle_encode_component,
            float_to_rgbe,
        )

        rng = np.random.default_rng(9)
        img = rng.random((32, 96, 3)).astype(np.float32) * 8
        img[4:12, 10:60] = 0.25  # long runs
        img[20, ::2] = 0.0  # alternating (literal-heavy)
        rgbe = float_to_rgbe(img)
        native = _native_encode(rgbe, 96, 32)
        if native is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        py = bytearray()
        for y in range(32):
            py += bytes([2, 2, 0, 96])
            for c in range(4):
                py += _rle_encode_component(rgbe[y, :, c])
        assert native == bytes(py)

        back = _native_decode(np.frombuffer(native, np.uint8), 96, 32)
        np.testing.assert_array_equal(back, rgbe)

    def test_decode_rejects_truncated(self):
        import numpy as np

        from lucille_tpu.imageio.rgbe import _native_decode, _native_encode, float_to_rgbe

        img = np.random.default_rng(3).random((8, 64, 3)).astype(np.float32)
        rgbe = float_to_rgbe(img)
        enc = _native_encode(rgbe, 64, 8)
        if enc is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        trunc = np.frombuffer(enc[: len(enc) // 2], np.uint8)
        assert _native_decode(trunc, 64, 8) is None  # no overrun, clean fail
