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
