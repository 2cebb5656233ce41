import numpy as np
import pytest

from lucille_tpu.sampling import hammersley, qmc


class TestSigma:
    def test_power_of_two_bit_reversal(self):
        # period 4 -> bit-reversal permutation (0, 2, 1, 3)
        tbl = hammersley.SigmaTable.make(4, 4)
        np.testing.assert_array_equal(tbl.sigmax, [0, 2, 1, 3])

    def test_period_8(self):
        tbl = hammersley.SigmaTable.make(8, 8)
        np.testing.assert_array_equal(tbl.sigmax, [0, 4, 2, 6, 1, 5, 3, 7])

    def test_subpixel_samples_in_unit_square(self):
        for s in (1, 2, 3, 4):
            jitter, inst = hammersley.subpixel_samples(s, s)
            assert jitter.shape == (s * s, 2)
            assert (jitter >= 0.0).all() and (jitter < 1.0 + 1e-12).all()

    def test_subpixel_samples_deterministic(self):
        a, _ = hammersley.subpixel_samples(3, 3)
        b, _ = hammersley.subpixel_samples(3, 3)
        np.testing.assert_array_equal(a, b)


class TestQMC:
    def test_radical_inverse_base2(self):
        # 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
        assert qmc.radical_inverse(1, 2) == 0.5
        assert qmc.radical_inverse(2, 2) == 0.25
        assert qmc.radical_inverse(3, 2) == 0.75

    def test_faure_permutations_reference_values(self):
        # Values from the reference's own comment block (qmc.c:170-179).
        p = qmc.faure_permutations(8)
        np.testing.assert_array_equal(p[2], [0, 1])
        np.testing.assert_array_equal(p[3], [0, 1, 2])
        np.testing.assert_array_equal(p[4], [0, 2, 1, 3])
        np.testing.assert_array_equal(p[5], [0, 3, 2, 1, 4])
        np.testing.assert_array_equal(p[6], [0, 2, 4, 1, 3, 5])
        np.testing.assert_array_equal(p[7], [0, 2, 5, 3, 1, 4, 6])
        np.testing.assert_array_equal(p[8], [0, 4, 2, 6, 1, 5, 3, 7])

    def test_faure_permutations_are_permutations(self):
        p = qmc.faure_permutations(50)
        for b in range(2, 51):
            assert sorted(p[b].tolist()) == list(range(b))

    def test_generalized_hammersley_dim1_equidistant(self):
        vals = qmc.generalized_hammersley(np.arange(10), 0, 10, 1, None)
        np.testing.assert_allclose(vals, np.arange(10) / 10.0)

    def test_generalized_radical_inverse_identity_perm_matches_vdc(self):
        perms = qmc.faure_permutations(3)
        ident = np.arange(2)
        for i in range(1, 40):
            got = qmc.generalized_radical_inverse(np.array([i]), 2, ident)[0]
            assert got == pytest.approx(qmc.radical_inverse(i, 2))

    def test_low_discrepancy_uniformity(self):
        # Halton base 2/3 over 1024 points: each quarter gets ~1/4 of mass.
        perms = qmc.faure_permutations(5)
        x = qmc.generalized_radical_inverse(np.arange(1024), 2, perms[2])
        y = qmc.generalized_radical_inverse(np.arange(1024), 3, perms[3])
        for arr in (x, y):
            h, _ = np.histogram(arr, bins=4, range=(0, 1))
            assert (np.abs(h - 256) <= 8).all()

    def test_fibonacci_lattice(self):
        pts = qmc.fibonacci_lattice(10)  # F_10 = 55 points
        assert pts.shape == (55, 2)
        assert (pts >= 0).all() and (pts < 1).all()

    def test_halton_jax_matches_host(self):
        import jax.numpy as jnp

        idx = np.arange(1, 200)
        got = np.asarray(qmc.halton_jax(jnp.asarray(idx), 3))
        want = np.array([qmc.radical_inverse(i, 3) for i in idx])
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestRNG:
    def test_pixel_keys_distinct(self):
        import jax

        from lucille_tpu.sampling.rng import pixel_key

        base = jax.random.key(0)
        k1 = pixel_key(base, 3, 5)
        k2 = pixel_key(base, 5, 3)
        a = jax.random.uniform(k1, (4,))
        b = jax.random.uniform(k2, (4,))
        assert not np.allclose(np.asarray(a), np.asarray(b))
