"""Native C++ BVH builder tests (skipped when g++ is unavailable)."""

import numpy as np
import pytest

from lucille_tpu.accel.bvh import _build_bvh_numpy, build_bvh
from lucille_tpu.native.loader import get_bvh_lib, native_build_bvh


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3))
    return (
        (c + rng.normal(0, 0.2, (n, 3))).astype(np.float32),
        (c + rng.normal(0, 0.2, (n, 3))).astype(np.float32),
        (c + rng.normal(0, 0.2, (n, 3))).astype(np.float32),
    )


needs_native = pytest.mark.skipif(
    get_bvh_lib() is None, reason="no native toolchain"
)


@needs_native
class TestNativeBVH:
    def test_invariants(self):
        v0, v1, v2 = _soup(777)
        out = native_build_bvh(v0, v1, v2, leaf_size=8)
        assert out is not None
        bbmin, bbmax, skip, first, count, order = out
        m = len(skip)
        n = 777
        leaf = count > 0
        assert sorted(order.tolist()) == list(range(n))
        assert count[leaf].sum() == n
        assert count[leaf].max() <= 8
        # skip-link walk visits every node once
        i, visited = 0, 0
        while i < m:
            visited += 1
            i = i + 1 if count[i] == 0 else int(skip[i])
        assert visited == m
        # parents contain children
        for i in range(m):
            if count[i] == 0:
                left = i + 1
                right = int(skip[left])
                for ch in (left, right):
                    assert (bbmin[i] <= bbmin[ch] + 1e-4).all()
                    assert (bbmax[i] >= bbmax[ch] - 1e-4).all()

    def test_matches_numpy_node_count_roughly(self):
        v0, v1, v2 = _soup(2000, seed=3)
        native = build_bvh(v0, v1, v2, use_native=True)
        numpy_ = _build_bvh_numpy(v0, v1, v2)
        # same algorithm; trees may differ in tie-breaks but sizes align
        assert abs(len(native.skip) - len(numpy_.skip)) < 0.1 * len(numpy_.skip)

    def test_traversal_parity_native_vs_numpy_tree(self):
        import jax.numpy as jnp

        from lucille_tpu.accel.pallas_bvh import (
            pallas_bvh_closest_hit as bvh_closest_hit,
        )
        from tests.test_intersect import _scene_from_tris

        v0, v1, v2 = _soup(500, seed=5)
        sc_native = _scene_from_tris(v0, v1, v2, "bvh")  # uses native builder
        rng = np.random.default_rng(9)
        B = 256
        org = jnp.asarray(rng.uniform(-12, 12, (B, 3)), jnp.float32)
        d = rng.normal(size=(B, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dirn = jnp.asarray(d, jnp.float32)

        from lucille_tpu.accel.bruteforce import brute_closest_hit

        r1 = brute_closest_hit(sc_native, org, dirn)
        r2 = bvh_closest_hit(sc_native, org, dirn)
        h = np.asarray(r1["hit"])
        np.testing.assert_array_equal(h, np.asarray(r2["hit"]))
        np.testing.assert_allclose(
            np.asarray(r1["t"])[h], np.asarray(r2["t"])[h], rtol=1e-4
        )

    def test_single_triangle(self):
        v0, v1, v2 = _soup(1)
        out = native_build_bvh(v0, v1, v2)
        assert out is not None
        assert len(out[2]) == 1  # one leaf node
