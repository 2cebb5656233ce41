import numpy as np
import pytest

from lucille_tpu.ops import vecmat as vm


def test_mat4_mul_row_vector_convention():
    # p @ (A @ B) must equal (p @ A) @ B: A applies first.
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=(4, 4)), rng.normal(size=(4, 4))
    p = rng.normal(size=(4,))
    np.testing.assert_allclose(p @ vm.mat4_mul(a, b), (p @ a) @ b, rtol=1e-12)


def test_translate_is_row3():
    t = vm.mat4_translate(1.0, 2.0, 3.0)
    p = np.array([5.0, 6.0, 7.0])
    np.testing.assert_allclose(vm.transform_point(p, t), [6.0, 8.0, 10.0])


def test_transform_vector_ignores_translation():
    t = vm.mat4_translate(1.0, 2.0, 3.0)
    v = np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(vm.transform_vector(v, t), v)


def test_rotate_90_about_z():
    r = vm.mat4_rotate(90.0, 0.0, 0.0, 1.0)
    p = np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(vm.transform_point(p, r), [0.0, 1.0, 0.0], atol=1e-12)


def test_normal_transform_preserves_perpendicularity():
    rng = np.random.default_rng(1)
    m = vm.mat4_identity()
    m[:3, :3] = rng.normal(size=(3, 3)) + 3 * np.eye(3)  # well-conditioned
    n = np.array([0.0, 1.0, 0.0])
    t = np.array([1.0, 0.0, 0.0])  # tangent, perpendicular to n
    n2 = vm.transform_normal(n, m)
    t2 = vm.transform_vector(t, m)
    assert abs(np.dot(n2, t2)) < 1e-10


def test_mat4_from_rib_translation_row():
    # ambient_occlusion.rib-style matrix: translation lives in the 4th row.
    vals = [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 1.828877, 0.821922, -1.982265, 1]
    m = vm.mat4_from_rib(vals)
    np.testing.assert_allclose(
        vm.transform_point(np.zeros(3), m), [1.828877, 0.821922, -1.982265]
    )


def test_normalize_jax_and_numpy():
    import jax.numpy as jnp

    v = np.array([[3.0, 0.0, 4.0]])
    np.testing.assert_allclose(vm.normalize(v), [[0.6, 0.0, 0.8]], atol=1e-7)
    out = vm.normalize(jnp.asarray(v, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), [[0.6, 0.0, 0.8]], atol=1e-6)


def test_normalize_zero_vector_is_zero():
    np.testing.assert_allclose(vm.normalize(np.zeros((1, 3))), np.zeros((1, 3)))
