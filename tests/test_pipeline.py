"""Displacement / Atmosphere / Imager shader execution
(shading/pipeline.py; reference ABI scope render/shader.h:27-120)."""

import numpy as np
import pytest

import jax.numpy as jnp


class TestImager:
    def test_background_fills_uncovered_pixels(self):
        from lucille_tpu.shading.pipeline import apply_imager

        frame = np.zeros((4, 4, 3), np.float32)
        frame[0, 0] = (0.5, 0.5, 0.5)
        alpha = np.zeros((4, 4), np.float32)
        alpha[0, 0] = 1.0
        out = np.asarray(
            apply_imager(frame, alpha, "MOSAICbackground",
                         {"color bgcolor": [0.2, 0.4, 0.6]})
        )
        assert np.allclose(out[0, 0], (0.5, 0.5, 0.5))  # covered: unchanged
        assert np.allclose(out[1, 1], (0.2, 0.4, 0.6))  # empty: bgcolor
        # fractional coverage blends
        alpha[2, 2] = 0.5
        out = np.asarray(
            apply_imager(frame, alpha, "background",
                         {"bgcolor": [1.0, 0.0, 0.0]})
        )
        assert out[2, 2, 0] == pytest.approx(0.5)

    def test_rib_imager_end_to_end(self, tmp_path):
        """A RIB with RiImager: escaped pixels get the bg color in the
        final frame (kills the MOSAICbackground warn-and-ignore)."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        s = RiState()
        parse_rib(
            'Display "out.hdr" "file" "rgb"\n'
            "PixelSamples 1 1\n"
            'Imager "MOSAICbackground" "bgcolor" [0.0 1.0 0.0]\n'
            "WorldBegin\n"
            'Translate 0 0 5\n'
            'PointsPolygons [4] [0 3 2 1] "P" '
            '[-0.5 -0.5 0  0.5 -0.5 0  0.5 0.5 0  -0.5 0.5 0]\n'
            "WorldEnd\n",
            s,
        )
        s.Format(16, 16)
        img = Renderer(s.scene, tile_size=16).render_frame()
        # corners miss the small quad -> pure green from the imager
        assert np.allclose(img[0, 0], (0.0, 1.0, 0.0), atol=1e-5)
        assert not np.allclose(img[8, 8], (0.0, 1.0, 0.0))

    def test_unknown_imager_warns_not_crashes(self):
        from lucille_tpu.shading.pipeline import apply_imager

        frame = np.ones((2, 2, 3), np.float32)
        out = apply_imager(frame, np.ones((2, 2), np.float32),
                           "NoSuchImager", {}, ["/nonexistent"])
        assert np.allclose(np.asarray(out), frame)


class TestAtmosphere:
    def test_fog_blends_toward_background(self):
        from lucille_tpu.shading.pipeline import apply_atmosphere

        ci = jnp.ones((3, 3), jnp.float32)
        ray_len = jnp.asarray([0.0, 5.0, 1e6])
        P = jnp.zeros((3, 3))
        hit = jnp.asarray([True, True, True])
        out = np.asarray(
            apply_atmosphere(ci, ray_len, P, hit, "fog",
                             {"distance": [5.0], "background": [0, 0, 0]})
        )
        assert np.allclose(out[0], 1.0)  # zero path: no fog
        assert out[2].max() < 1e-3  # infinite path: all background
        assert 0.3 < out[1, 0] < 0.4  # e^-1 survival

    def test_mosaicfog_defaults_are_noop_and_mist_is_not(self):
        from lucille_tpu.shading.pipeline import apply_atmosphere

        ci = jnp.ones((2, 3), jnp.float32)
        ray_len = jnp.asarray([10.0, 10.0])
        P = jnp.zeros((2, 3))
        hit = jnp.asarray([True, True])
        out = np.asarray(apply_atmosphere(ci, ray_len, P, hit, "MOSAICfog", {}))
        assert np.allclose(out, 1.0)  # isMist=0 -> no-op (the export default)
        out = np.asarray(
            apply_atmosphere(
                ci, ray_len, P, hit, "MOSAICfog",
                {"isMist": [1.0], "Sta": [0.0], "Di": [5.0],
                 "MistType": [1.0], "MistCol": [1.0, 0.0, 0.0]},
            )
        )
        assert np.allclose(out[0], (1.0, 0.0, 0.0))  # beyond Di: all mist

    def test_escaped_rays_not_fogged(self):
        from lucille_tpu.shading.pipeline import apply_atmosphere

        ci = jnp.ones((1, 3), jnp.float32) * 0.7
        out = np.asarray(
            apply_atmosphere(ci, jnp.asarray([100.0]), jnp.zeros((1, 3)),
                             jnp.asarray([False]), "fog", {"distance": [1.0]})
        )
        assert np.allclose(out, 0.7)

    def test_rib_atmosphere_render(self):
        """Atmosphere bound in a RIB changes the rendered image; the
        driver's 'unsupported' warning is gone."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        def build(atmo):
            s = RiState()
            parse_rib(
                "PixelSamples 1 1\n"
                "WorldBegin\n"
                + atmo
                + 'Translate 0 0 5\n'
                'PointsPolygons [4] [0 3 2 1] "P" '
                '[-5 -5 0  5 -5 0  5 5 0  -5 5 0]\n'
                "WorldEnd\n",
                s,
            )
            s.Format(8, 8)
            return Renderer(s.scene, tile_size=8).render_frame()

        plain = build("")
        fogged = build(
            'Atmosphere "fog" "distance" [1.0] "background" [1 0 0]\n'
        )
        assert not np.allclose(plain, fogged)
        assert fogged[4, 4, 0] > fogged[4, 4, 1]  # fogged toward red


class TestDisplacement:
    def _quad_desc(self, disp_rib, tmp_path, n=8):
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        # regular grid quad in the xz plane with st coords
        xs = np.linspace(-1, 1, n)
        P, st = [], []
        for z in xs:
            for x in xs:
                P.extend([x, 0.0, z])
                st.extend([(x + 1) / 2, (z + 1) / 2])
        quads = []
        for j in range(n - 1):
            for i in range(n - 1):
                a = j * n + i
                quads.append([a, a + 1, a + n + 1, a + n])
        nverts = " ".join(["4"] * len(quads))
        idx = " ".join(str(i) for q in quads for i in q)
        s = RiState()
        parse_rib(
            f'Option "searchpath" "shader" ["{tmp_path}"] '
            f'"texture" ["{tmp_path}"]\n'
            "WorldBegin\n" + disp_rib +
            f'PointsPolygons [{nverts}] [{idx}] "P" [' +
            " ".join(f"{v:g}" for v in P) + '] "st" [' +
            " ".join(f"{v:g}" for v in st) + "]\n"
            "WorldEnd\n",
            s,
        )
        return s

    def test_sl_displacement_moves_vertices(self, tmp_path):
        from lucille_tpu.shading.pipeline import displace_scene

        (tmp_path / "lift.sl").write_text(
            "displacement lift(float amp = 0.25;) {\n"
            "  P += amp * normalize(N);\n"
            "  N = calculatenormal(P);\n"
            "}\n"
        )
        s = self._quad_desc('Displacement "lift" "amp" [0.25]\n', tmp_path)
        P0 = np.asarray(s.scene.geoms[0].positions).copy()
        displace_scene(s.scene)
        P1 = np.asarray(s.scene.geoms[0].positions)
        # the flat quad's normal is +-y; every vertex moved 0.25 along it
        dy = np.abs(P1[:, 1] - P0[:, 1])
        assert np.allclose(dy, 0.25, atol=1e-5)
        # idempotent on re-entry (a second Renderer must not re-displace)
        displace_scene(s.scene)
        assert np.allclose(np.asarray(s.scene.geoms[0].positions), P1)

    def test_mosaic_dispmap_perturbs_silhouette(self, tmp_path):
        """MOSAICdisplace with a DispMap texture displaces P and rebuilds
        normals (the round-1..2 warn-and-ignore is gone)."""
        from lucille_tpu.imageio.rgbe import write_hdr
        from lucille_tpu.shading.pipeline import displace_scene

        # ramp displacement map: s in [0,1] -> height
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :, :] = np.linspace(0, 1, 8)[None, :, None]
        write_hdr(tmp_path / "ramp.hdr", img)
        s = self._quad_desc(
            'Displacement "MOSAICdisplace" "DispMap" ["ramp.hdr"] '
            '"Disp" [1.0] "Mid" [0.0]\n',
            tmp_path,
        )
        P0 = np.asarray(s.scene.geoms[0].positions).copy()
        N0 = np.asarray(s.scene.geoms[0].normals) if s.scene.geoms[0].normals is not None else None
        displace_scene(s.scene)
        g = s.scene.geoms[0]
        P1 = np.asarray(g.positions)
        assert not np.allclose(P0, P1)
        # higher s -> larger |dy|; normals no longer all +-y
        dy = np.abs(P1[:, 1])
        order = np.argsort(np.asarray(s.scene.geoms[0].st)[:, 0])
        assert dy[order[-1]] > dy[order[0]]
        N1 = np.asarray(g.normals)
        assert (np.abs(N1[:, 0]) + np.abs(N1[:, 2])).max() > 1e-3
        del N0
