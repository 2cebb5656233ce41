"""BRDF / reflection / film / noise / spectrum tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lucille_tpu.shading import brdf, reflection


def _v(*xyz):
    return jnp.asarray([xyz], dtype=jnp.float32)


class TestReflection:
    def test_reflect_mirror(self):
        inc = _v(1.0, -1.0, 0.0) / np.sqrt(2)
        n = _v(0.0, 1.0, 0.0)
        r = reflection.reflect(inc, n)
        np.testing.assert_allclose(
            np.asarray(r[0]), [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6
        )

    def test_refract_straight_through_eta1(self):
        inc = _v(0.0, -1.0, 0.0)
        n = _v(0.0, 1.0, 0.0)
        t, tir = reflection.refract(inc, n, 1.0)
        assert not bool(tir[0])
        np.testing.assert_allclose(np.asarray(t[0]), [0, -1, 0], atol=1e-6)

    def test_refract_snell(self):
        # 45 deg incidence into eta=1.5: sin(t) = sin(45)/1.5
        inc = _v(1.0, -1.0, 0.0) / np.sqrt(2)
        n = _v(0.0, 1.0, 0.0)
        t, tir = reflection.refract(inc, n, 1.5)
        assert not bool(tir[0])
        sin_t = float(np.abs(np.asarray(t[0, 0])))
        assert sin_t == pytest.approx(np.sin(np.pi / 4) / 1.5, abs=1e-5)

    def test_total_internal_reflection(self):
        # grazing exit from dense medium: incident from below the surface
        inc = _v(0.9, 0.43589, 0.0)  # mostly tangential, going up
        n = _v(0.0, 1.0, 0.0)
        t, tir = reflection.refract(inc, n, 1.5)
        assert bool(tir[0])  # sin > 1/1.5 -> TIR

    def test_fresnel_energy_conservation(self):
        inc = reflection._norm(_v(0.3, -1.0, 0.1))
        n = _v(0.0, 1.0, 0.0)
        r, t, kr, kt = reflection.fresnel(inc, n, 1.5)
        assert 0.0 <= float(kr[0]) <= 1.0
        assert float(kr[0] + kt[0]) == pytest.approx(1.0, abs=1e-6)

    def test_fresnel_normal_incidence_value(self):
        # R0 = ((n-1)/(n+1))^2 = 0.04 for eta 1.5
        inc = _v(0.0, -1.0, 0.0)
        n = _v(0.0, 1.0, 0.0)
        _, _, kr, _ = reflection.fresnel(inc, n, 1.5)
        assert float(kr[0]) == pytest.approx(0.04, abs=1e-3)

    def test_cosweight_sample_distribution(self):
        from lucille_tpu.transport.ao import ortho_basis

        key = jax.random.key(0)
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4096, 3))
        u = jax.random.uniform(key, (4096, 2))
        d, pdf = reflection.cosweight_sample(u[:, 0], u[:, 1], ortho_basis(n))
        cz = np.asarray(d[:, 2])
        assert (cz >= 0).all()
        # E[cos] = 2/3 for cosine-weighted hemisphere
        assert cz.mean() == pytest.approx(2.0 / 3.0, abs=0.02)
        np.testing.assert_allclose(np.asarray(pdf), cz / np.pi, atol=1e-5)


class TestBRDF:
    def setup_method(self):
        self.n = _v(0.0, 0.0, 1.0)
        self.wi = reflection._norm(_v(0.3, 0.2, 1.0))
        self.wo = reflection._norm(_v(-0.4, 0.1, 1.0))

    def test_lambert_cosine(self):
        val = brdf.lambert(self.wo, self.wi, self.n, 0.8)
        expect = 0.8 * float(jnp.sum(self.wi * self.n, axis=-1)[0])
        assert float(val[0]) == pytest.approx(expect, rel=1e-6)

    def test_lambert_below_horizon_is_zero(self):
        below = _v(0.0, 0.0, -1.0)
        assert float(brdf.lambert(self.wo, below, self.n, 0.8)[0]) == 0.0

    def test_modified_phong_normalization(self):
        """Integral of ks (g+2)/(2pi) cos^g over the hemisphere around the
        reflection dir <= 1: Monte-Carlo check of energy bound."""
        g = 30.0
        key = jax.random.key(1)
        u = jax.random.uniform(key, (8192, 2))
        # uniform hemisphere dirs
        z = u[:, 0]
        phi = 2 * jnp.pi * u[:, 1]
        s = jnp.sqrt(1 - z * z)
        wi = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
        wo = jnp.broadcast_to(reflection._norm(_v(0.0, 0.0, 1.0)), wi.shape)
        n = jnp.broadcast_to(self.n, wi.shape)
        f = brdf.modified_phong(wo, wi, n, 0.0, 1.0, g)
        # estimator of integral f dcos: mean(f * cos) * 2pi
        integral = float(
            (f * jnp.maximum(wi[:, 2], 0)).mean() * 2 * jnp.pi
        )
        assert integral <= 1.05

    def test_phong_specular_peak_at_mirror(self):
        wo = reflection._norm(_v(0.5, 0.0, 1.0))
        n = self.n
        # mirror of the view direction: reflect the INCIDENT ray (-wo)
        r = reflection.reflect(-wo, n)
        at_peak = brdf.phong(wo, r, n, 0.0, 1.0, 50.0)
        off_peak = brdf.phong(wo, reflection._norm(r + _v(0.3, 0.0, 0.0)), n, 0.0, 1.0, 50.0)
        assert float(at_peak[0]) > float(off_peak[0])

    def test_ward_reduces_to_diffuse_below_horizon(self):
        u = _v(1.0, 0.0, 0.0)
        v = _v(0.0, 1.0, 0.0)
        below = _v(0.0, 0.0, -1.0)
        val = brdf.ward_anisotropic(self.wo, below, self.n, u, v, 0.5, 0.5, 0.1, 0.1)
        assert float(val[0]) == pytest.approx(0.5 / np.pi, rel=1e-5)

    def test_ashikhmin_shirley_rgb_shape(self):
        u = _v(1.0, 0.0, 0.0)
        v = _v(0.0, 1.0, 0.0)
        kd = jnp.asarray([[0.5, 0.2, 0.1]])
        ks = jnp.asarray([[0.1, 0.1, 0.1]])
        out = brdf.ashikhmin_shirley(self.wo, self.wi, self.n, u, v, kd, ks, 10.0, 100.0)
        assert out.shape == (1, 3)
        assert (np.asarray(out) >= 0).all()

    def test_sample_modified_phong_around_reflection(self):
        key = jax.random.key(2)
        wi = jnp.broadcast_to(reflection._norm(_v(0.0, 0.5, -1.0)), (1024, 3))
        n = jnp.broadcast_to(self.n, (1024, 3))
        u = jax.random.uniform(key, (1024, 2))
        wo, pdf = brdf.sample_modified_phong(wi, n, u[:, 0], u[:, 1], 200.0)
        refdir = np.asarray(reflection.reflect(wi, n))[0]
        mean_dir = np.asarray(wo).mean(axis=0)
        mean_dir /= np.linalg.norm(mean_dir)
        assert np.dot(mean_dir, refdir) > 0.95


class TestFilm:
    def test_filter_tables_normalized(self):
        from lucille_tpu.render.film import subsample_filter_table
        from lucille_tpu.sampling.hammersley import subpixel_samples

        jitter, _ = subpixel_samples(3, 3)
        for name in ("box", "triangle", "gaussian", "catmull-rom", "sinc"):
            w = subsample_filter_table(name, jitter)
            assert w.sum() == pytest.approx(1.0, abs=1e-6)
            assert (w >= 0).all() or name in ("catmull-rom", "sinc")

    def test_box_weights_uniform(self):
        from lucille_tpu.render.film import subsample_filter_table
        from lucille_tpu.sampling.hammersley import subpixel_samples

        jitter, _ = subpixel_samples(2, 2)
        w = subsample_filter_table("box", jitter)
        np.testing.assert_allclose(w, 0.25)

    def test_tonemap(self):
        from lucille_tpu.render.film import tonemap_exposure

        img = np.full((2, 2, 3), 0.25)
        out = tonemap_exposure(img, gain=4.0, gamma=2.0)
        np.testing.assert_allclose(out, 1.0)


class TestNoise:
    def test_perlin_range_and_smoothness(self):
        from lucille_tpu.ops.noise import perlin3

        p = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (1024, 3)), jnp.float32)
        n = np.asarray(perlin3(p))
        assert (n >= 0).all() and (n <= 1).all()
        assert 0.3 < n.mean() < 0.7
        # lattice points evaluate to 0.5 (gradient noise is zero there)
        lat = np.asarray(perlin3(jnp.asarray([[1.0, 2.0, 3.0]])))
        assert lat[0] == pytest.approx(0.5, abs=1e-6)

    def test_noise_is_continuous(self):
        from lucille_tpu.ops.noise import perlin3

        a = float(perlin3(jnp.asarray([[1.5, 2.5, 0.5]]))[0])
        b = float(perlin3(jnp.asarray([[1.5001, 2.5, 0.5]]))[0])
        assert abs(a - b) < 1e-3


class TestSpectrum:
    def test_flat_spectrum_is_whiteish(self):
        from lucille_tpu.ops.spectrum import spectrum_to_rgb

        rgb = spectrum_to_rgb(lambda wl: 1.0)
        assert (rgb > 0).all()
        # flat spectrum ~ equal-energy white: channels within 50%
        assert rgb.max() / rgb.min() < 2.0

    def test_monochromatic_red(self):
        from lucille_tpu.ops.spectrum import spectrum_to_rgb

        rgb = spectrum_to_rgb(lambda wl: 1.0 if 620 <= wl <= 700 else 0.0)
        assert rgb[0] > rgb[1] and rgb[0] > rgb[2]
