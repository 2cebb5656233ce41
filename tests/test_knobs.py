"""Parity coverage for the surviving LUCILLE_* kernel knobs.

Every env knob that reaches a compiled kernel gets one interpret-mode
parity test (VERDICT r4 weak 5): flipping the knob must change HOW the
work runs, never WHAT a gather ray can hit.  Knobs change jit cache
keys via module reload / static args, so each case runs the wrapper
with the env var set around the call (the wrappers read the env at call
time and pass it as a static argument or recompute the host build).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_pallas_bvh import _random_soup, _scene


def _gather_setup(n=900, B=64, seed=3):
    from lucille_tpu.transport.ao import ortho_basis

    sc = _scene(*_random_soup(n, seed=seed))
    rng = np.random.default_rng(seed)
    P = jnp.asarray(rng.uniform(-4, 4, (B, 3)), jnp.float32)
    Nrm = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    Nrm = Nrm / jnp.linalg.norm(Nrm, axis=-1, keepdims=True)
    b0, b1, b2 = ortho_basis(Nrm)
    hit = jnp.ones((B,), bool)
    key = jax.random.key(9)
    return sc, P, b0, b1, b2, hit, key


def _occ(sc, P, b0, b1, b2, hit, key, env=None):
    """AO occlusion counts through pallas_bvh_ao_occlusion with env
    overrides applied for the call."""
    from lucille_tpu.accel.pallas_bvh import pallas_bvh_ao_occlusion

    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        occ, _ = pallas_bvh_ao_occlusion(
            sc, P, b0, b1, b2, hit, key, 4, 4
        )
        return np.asarray(occ)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


class TestBVHKnobs:
    def test_cone_k_is_occlusion_invariant(self):
        """LUCILLE_BVH_CONE_K regroups lanes into blocks; each lane's
        (origin, stratum) rays and the conservative per-lane reach are
        unchanged, so occlusion counts match EXACTLY."""
        args = _gather_setup()
        base = _occ(*args)
        for k in ("2", "8"):
            got = _occ(*args, env={"LUCILLE_BVH_CONE_K": k})
            np.testing.assert_array_equal(got, base)

    def test_node_budget_is_occlusion_invariant(self):
        """LUCILLE_BVH_NODES changes the tree (leaf sizes), not the
        triangle tests a reaching lane sees: same counts exactly.
        The budget is read at BUILD time, so the scene is rebuilt."""
        from tests.test_pallas_bvh import _random_soup as soup

        v = soup(900, seed=3)
        args = _gather_setup()
        base = _occ(*args)
        saved = os.environ.get("LUCILLE_BVH_NODES")
        os.environ["LUCILLE_BVH_NODES"] = "8"  # forces leaf-size doubling
        try:
            sc2 = _scene(*v)
            assert sc2.n_nodes != args[0].n_nodes  # budget actually bit
            got = _occ(sc2, *args[1:])
            np.testing.assert_array_equal(got, base)
        finally:
            if saved is None:
                os.environ.pop("LUCILLE_BVH_NODES", None)
            else:
                os.environ["LUCILLE_BVH_NODES"] = saved

    def test_ao_mode_fused_matches_cone(self):
        """LUCILLE_BVH_AO=fused generates jitter per COMPACTED lane
        inside the kernel (a different stream from the cone path's
        raster-lane _stratified_dirs by design), so the comparison is
        distributional, like rebinned's."""
        args = _gather_setup(B=256)
        base = _occ(*args)
        got = _occ(*args, env={"LUCILLE_BVH_AO": "fused"})
        assert abs(got.mean() - base.mean()) < 0.75  # of 16 rays/lane

    def test_ao_block_is_occlusion_invariant(self):
        """LUCILLE_BVH_AO_BLOCK (fused-mode lanes per walk) regroups
        blocks only — same jitter stream, exact."""
        args = _gather_setup()
        base = _occ(*args, env={"LUCILLE_BVH_AO": "fused"})
        got = _occ(
            *args,
            env={"LUCILLE_BVH_AO": "fused", "LUCILLE_BVH_AO_BLOCK": "512"},
        )
        np.testing.assert_array_equal(got, base)

    def test_ao_mode_rebinned_matches_statistically(self):
        """LUCILLE_BVH_AO=rebinned draws per-raster-lane uniforms (a
        DIFFERENT stream by design, pallas_bvh.py docstring), so the
        comparison is distributional: mean occlusion within MC noise."""
        args = _gather_setup(B=256)
        base = _occ(*args)
        got = _occ(*args, env={"LUCILLE_BVH_AO": "rebinned"})
        assert abs(got.mean() - base.mean()) < 0.75  # of 16 rays/lane


class TestFrameAccumKnob:
    def test_frame_accum_image_is_identical(self):
        """LUCILLE_FRAME_ACCUM=1 assembles the frame on-device and pulls
        once; the pixels must match the per-tile path exactly."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        def render(accum):
            s = RiState()
            parse_rib(
                'Display "t.hdr" "file" "rgb"\n'
                "PixelSamples 1 1\n"
                'Projection "perspective" "fov" [45]\n'
                'Orientation "rh"\n'
                "ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  0 -1 -8 1]\n"
                "WorldBegin\n"
                'PointsPolygons [4] [0 3 2 1] "P" '
                "[-5 0 -5  5 0 -5  5 0 5  -5 0 5]\n"
                'PointsPolygons [3] [0 1 2] "P" [-1 0 -1  1 0 -1  0 2 0]\n'
                "WorldEnd\n",
                s,
            )
            s.Format(64, 32)
            s.options.gather_nsamples = 4
            saved = os.environ.get("LUCILLE_FRAME_ACCUM")
            os.environ["LUCILLE_FRAME_ACCUM"] = accum
            try:
                r = Renderer(s.scene, tile_size=16)
                return np.asarray(r.render_frame())
            finally:
                if saved is None:
                    os.environ.pop("LUCILLE_FRAME_ACCUM", None)
                else:
                    os.environ["LUCILLE_FRAME_ACCUM"] = saved

        tiled = render("0")
        accum = render("1")
        np.testing.assert_array_equal(accum, tiled)
