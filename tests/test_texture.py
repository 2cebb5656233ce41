"""Texture system tests: atlas fetch, IBL projections, end-to-end render
with a disk texture (texcoord_st regression capability)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lucille_tpu.texture.texture import (
    TextureAtlas,
    build_mipmaps,
    ibl_fetch_latlong,
    summed_area_table,
)


def _checker(n=32, cell=4):
    img = np.zeros((n, n, 3), dtype=np.float32)
    for y in range(n):
        for x in range(n):
            img[y, x] = 1.0 if ((x // cell + y // cell) % 2) == 0 else 0.0
    return img


class TestAtlas:
    def test_fetch_corners(self):
        img = np.zeros((4, 4, 3), dtype=np.float32)
        img[0, 0] = (1, 0, 0)
        img[3, 3] = (0, 0, 1)
        atlas = TextureAtlas.build({"t": img})
        out = atlas.fetch(0, jnp.asarray([0.0, 1.0]), jnp.asarray([0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(out[0]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), [0, 0, 1], atol=1e-6)

    def test_bilinear_midpoint(self):
        img = np.zeros((1, 2, 3), dtype=np.float32)
        img[0, 1] = 1.0
        atlas = TextureAtlas.build({"t": img})
        out = atlas.fetch(0, jnp.asarray([0.5]), jnp.asarray([0.0]))
        np.testing.assert_allclose(np.asarray(out[0]), 0.5, atol=1e-6)

    def test_multiple_textures_different_sizes(self):
        a = np.full((4, 4, 3), 0.25, dtype=np.float32)
        b = np.full((8, 16, 3), 0.75, dtype=np.float32)
        atlas = TextureAtlas.build({"a": a, "b": b})
        ia, ib = atlas.id_of("a"), atlas.id_of("b")
        s = jnp.asarray([0.9])
        out_a = atlas.fetch(ia, s, s)
        out_b = atlas.fetch(ib, s, s)
        np.testing.assert_allclose(np.asarray(out_a[0]), 0.25, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_b[0]), 0.75, atol=1e-6)

    def test_clamp_addressing(self):
        img = _checker()
        atlas = TextureAtlas.build({"c": img})
        out = atlas.fetch(0, jnp.asarray([-0.5, 1.5]), jnp.asarray([0.0, 0.0]))
        assert np.isfinite(np.asarray(out)).all()


class TestMipsAndSAT:
    def test_mip_chain_halves(self):
        mips = build_mipmaps(_checker(32))
        assert mips[0].shape[:2] == (32, 32)
        assert mips[1].shape[:2] == (16, 16)
        # average is preserved by box filtering
        assert mips[-1].mean() == pytest.approx(mips[0].mean(), abs=1e-5)

    def test_sat_total(self):
        img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3))
        sat = summed_area_table(img)
        assert sat[-1, -1] == pytest.approx(img.mean(-1).sum(), rel=1e-9)


class TestIBLProjection:
    def test_latlong_up_down(self):
        img = np.zeros((8, 16, 3), dtype=np.float32)
        img[0, :] = (1, 0, 0)  # top row = +y pole
        img[-1, :] = (0, 0, 1)  # bottom row = -y pole
        atlas = TextureAtlas.build({"env": img})
        up = jnp.asarray([[0.0, 1.0, 0.0]])
        down = jnp.asarray([[0.0, -1.0, 0.0]])
        cu = np.asarray(ibl_fetch_latlong(atlas, 0, up))[0]
        cd = np.asarray(ibl_fetch_latlong(atlas, 0, down))[0]
        assert cu[0] > 0.9 and cd[2] > 0.9


class TestEndToEnd:
    def test_textured_matte_render(self, tmp_path):
        """A textured quad renders the checker pattern (texcoord_st
        regression capability, tests/render/texcoord_st_20090301.rib)."""
        from lucille_tpu.imageio.loader import save_image
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        save_image(tmp_path / "checker.hdr", _checker(64, 8))
        s = RiState()
        parse_rib(
            'Projection "perspective" "fov" [45]\n'
            f'Option "searchpath" "texture" ["{tmp_path}"]\n'
            "WorldBegin\n"
            'Surface "matte" "texturename" ["checker.hdr"]\n'
            'Polygon "P" [ 1 1 3  1 -1 3  -1 -1 3  -1 1 3 ]\n'
            '  "facevertex float s" [0 0 1 1] "facevertex float t" [0 1 1 0]\n'
            "WorldEnd\n",
            s,
        )
        s.Format(48, 48)
        s.options.gather_nsamples = 4
        r = Renderer(s.scene, tile_size=48)
        assert r.textures.id_of("checker.hdr") == 0
        img = r.render_frame()
        lum = img.mean(-1)
        assert (lum > 0.5).mean() > 0.1  # bright squares
        assert ((lum < 0.2) & (lum >= 0.0)).mean() > 0.1  # dark squares
