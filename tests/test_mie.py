"""Lorenz-Mie phase function (ops/mie.py) vs the physics it implements.

The reference's rnd/MieScattering tool (mie.c) computes the same
Frisvad/Christensen/Jensen recurrences; with no published numbers to pin,
the oracles are the closed-form limits of Lorenz-Mie theory itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lucille_tpu.ops.mie import (
    asymmetry,
    cross_sections,
    milk_phase_table,
    phase_lookup,
    phase_table,
)


class TestPhysics:
    def test_rayleigh_limit(self):
        # particle << wavelength: p ~ (1 + cos^2 theta), so
        # p(0)/p(90 deg) -> 2
        p = phase_table(600.0, 10.0, 1.46, 1.0, 1024)
        assert p[0] / p[256] == pytest.approx(2.0, rel=0.02)

    def test_normalization(self):
        # eq 25's p integrates to 1 over the sphere
        for r in (10.0, 300.0, 1000.0):
            p = phase_table(600.0, r, 1.46, 1.0, 2048)
            th = np.arange(2048) / 2048 * 2 * np.pi
            half = slice(0, 1024)
            integ = (
                2 * np.pi
                * np.trapezoid(p[half] * np.sin(th[half]), th[half])
            )
            assert integ == pytest.approx(1.0, abs=0.02)

    def test_milk_fat_is_forward_scattering(self):
        # 1 um fat globule at 600 nm: strongly forward-peaked
        g = asymmetry(600.0, 1000.0, 1.46, 1.0)
        assert 0.5 < g < 1.0
        p = milk_phase_table()
        assert p[0] > 10.0 * p[512]  # forward >> backward

    def test_nonabsorbing_albedo_is_one(self):
        # Im(eta) = 0 host and particle: Cs == Ct
        ct, cs = cross_sections(600.0, 1000.0, 1.46, 1.0)
        assert cs / ct == pytest.approx(1.0, abs=1e-6)
        assert ct > 0

    def test_lookup_matches_table(self):
        p = milk_phase_table()
        v = np.asarray(
            phase_lookup(p, jnp.asarray([1.0, 0.0, -1.0], jnp.float32))
        )
        np.testing.assert_allclose(v, [p[0], p[256], p[512]], rtol=1e-3)


class TestSSSIntegration:
    def test_mie_phase_changes_sss(self):
        from lucille_tpu.lights.tables import LightEntry, LightTables
        from lucille_tpu.transport.sss import single_scattering
        from tests.test_transport import _plane_scene

        _, scene, _ = _plane_scene()
        lights = LightTables(
            [
                LightEntry(
                    type="distant",
                    position=(0, 10, 0),
                    direction=(0, -1, 0),
                    color=(1, 1, 1),
                    intensity=5.0,
                )
            ]
        )
        B = 32
        P = jnp.stack(
            [jnp.linspace(-2, 2, B), jnp.zeros(B), jnp.zeros(B)], axis=-1
        )
        N = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        eye = jnp.broadcast_to(
            jnp.asarray([0.3, -1.0, 0.0]) / np.sqrt(1.09), (B, 3)
        )
        key = jax.random.key(0)
        iso = np.asarray(single_scattering(scene, lights, P, N, eye, key))
        mie = np.asarray(
            single_scattering(
                scene, lights, P, N, eye, key,
                phase_table=milk_phase_table(),
            )
        )
        assert np.isfinite(mie).all() and (mie >= 0).all()
        assert mie.mean() > 0
        # a forward-peaked phase reweights the gather: results differ
        assert not np.allclose(iso, mie)


class TestMieFogAtmosphere:
    def test_miefog_forward_scattering_haze(self):
        """The miefog atmosphere (shading/pipeline.py): extinction is
        monotone in ray length, escaped rays are untouched, and looking
        TOWARD the sun in-scatters more than looking away (the Mie
        forward lobe)."""
        from lucille_tpu.shading.pipeline import apply_atmosphere

        B = 4
        ci = jnp.ones((B, 3), jnp.float32)
        ray_len = jnp.asarray([1.0, 10.0, 100.0, 5.0], jnp.float32)
        P = jnp.zeros((B, 3), jnp.float32)
        hit = jnp.asarray([True, True, True, False])
        sun = np.array([0.0, 0.0, 1.0])
        dirn = jnp.asarray(
            [[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1]], jnp.float32
        )
        params = {"sundir": sun, "density": 0.05, "intensity": 0.0}
        out = np.asarray(
            apply_atmosphere(ci, ray_len, P, hit, "miefog", params,
                             dirn=dirn)
        )
        # pure extinction (sun off): monotone decreasing with length
        assert out[0, 0] > out[1, 0] > out[2, 0]
        np.testing.assert_allclose(out[3], 1.0)  # escaped ray untouched

        # sun on: toward-sun rays pick up more in-scatter than away
        params = {"sundir": sun, "density": 0.05, "intensity": 1.0}
        toward = np.asarray(
            apply_atmosphere(
                jnp.zeros((1, 3)), jnp.asarray([50.0]), P[:1],
                jnp.asarray([True]), "miefog", params,
                dirn=jnp.asarray([[0.0, 0.0, 1.0]]),
            )
        )
        away = np.asarray(
            apply_atmosphere(
                jnp.zeros((1, 3)), jnp.asarray([50.0]), P[:1],
                jnp.asarray([True]), "miefog", params,
                dirn=jnp.asarray([[0.0, 0.0, -1.0]]),
            )
        )
        assert toward[0, 0] > 5.0 * away[0, 0]

    def test_miefog_through_renderer(self, tmp_path):
        """Atmosphere "miefog" bound in a RIB renders end-to-end."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        s = RiState()
        parse_rib(
            f'Display "{tmp_path}/mie.hdr" "file" "rgb"\n'
            "PixelSamples 1 1\n"
            'Projection "perspective" "fov" [45]\n'
            'Orientation "rh"\n'
            "ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  0 -1 -8 1]\n"
            "WorldBegin\n"
            'Atmosphere "miefog" "density" [0.08] "intensity" [0.5] '
            '"sundir" [0.3 1.0 0.2]\n'
            'PointsPolygons [4] [0 3 2 1] "P" '
            "[-5 0 -5  5 0 -5  5 0 5  -5 0 5]\n"
            "WorldEnd\n",
            s,
        )
        s.Format(32, 24)
        s.options.gather_nsamples = 4
        r = Renderer(s.scene, tile_size=16)
        img = np.asarray(r.render_frame())
        assert np.isfinite(img).all()
        assert img.mean() > 0.0  # the haze in-scatters over the plane
