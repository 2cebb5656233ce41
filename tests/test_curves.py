"""Curve/fur primitive (ri/curves.py) — the FurRender analog.

Oracles: the analytic cubic Bezier the reference's curve.c evaluates
(ri_bezier_curve_eval3), plus an end-to-end fur render.
"""

import numpy as np
import pytest

from lucille_tpu.ri.curves import (
    SAMPLES_PER_SEGMENT,
    TUBE_SIDES,
    bezier_eval,
    build_curves,
)
from lucille_tpu.ri.types import AttributeState


def _straight_cp():
    # a straight strand along +y
    return np.array(
        [[0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 3, 0]], np.float64
    )


class TestBezier:
    def test_endpoints_and_midpoint(self):
        cp = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [2, 1, 0]], np.float64
        )
        p, dp = bezier_eval(cp, np.array([0.0, 0.5, 1.0]))
        np.testing.assert_allclose(p[0], cp[0], atol=1e-12)
        np.testing.assert_allclose(p[2], cp[3], atol=1e-12)
        # de Casteljau midpoint
        np.testing.assert_allclose(p[1], [1.0, 0.5, 0.0], atol=1e-12)
        # tangent at 0 along cp1-cp0
        t0 = dp[0] / np.linalg.norm(dp[0])
        np.testing.assert_allclose(t0, [1, 0, 0], atol=1e-12)


class TestTessellation:
    def test_tube_geometry(self):
        attrs = AttributeState()
        g = build_curves(
            "cubic", [4], "nonperiodic",
            {"P": _straight_cp().reshape(-1), "constantwidth": [0.2]},
            np.eye(4), True, attrs,
        )
        n = SAMPLES_PER_SEGMENT + 1
        assert g.positions.shape == (n * TUBE_SIDES, 3)
        assert g.ntriangles == (n - 1) * TUBE_SIDES * 2
        # every ring vertex sits at radius width/2 from the axis (x-z dist)
        r = np.hypot(g.positions[:, 0], g.positions[:, 2])
        np.testing.assert_allclose(r, 0.1, atol=1e-9)
        # normals are radial (perpendicular to the strand axis +y)
        assert np.abs(g.normals[:, 1]).max() < 1e-6

    def test_tessellation_tracks_curve(self):
        # tube axis samples lie on the analytic Bezier
        cp = np.array(
            [[0, 0, 0], [1, 2, 0], [3, 2, 1], [4, 0, 1]], np.float64
        )
        attrs = AttributeState()
        g = build_curves(
            "cubic", [4], "nonperiodic",
            {"P": cp.reshape(-1), "constantwidth": [0.02]},
            np.eye(4), True, attrs,
        )
        n = SAMPLES_PER_SEGMENT + 1
        rings = g.positions.reshape(n, TUBE_SIDES, 3)
        centers = rings.mean(axis=1)
        p, _ = bezier_eval(cp, np.arange(n) / (n - 1))
        np.testing.assert_allclose(centers, p, atol=1e-6)

    def test_varying_width_interpolates(self):
        attrs = AttributeState()
        g = build_curves(
            "cubic", [4], "nonperiodic",
            {
                "P": _straight_cp().reshape(-1),
                "width": [0.2, 0.2, 0.2, 0.0],  # taper to a tip
            },
            np.eye(4), True, attrs,
        )
        n = SAMPLES_PER_SEGMENT + 1
        rings = g.positions.reshape(n, TUBE_SIDES, 3)
        r = np.hypot(rings[..., 0], rings[..., 2]).mean(axis=1)
        assert r[0] == pytest.approx(0.1, abs=1e-9)
        assert r[-1] == pytest.approx(0.0, abs=1e-9)
        assert (np.diff(r) <= 1e-9).all()

    def test_multiple_strands_and_linear(self):
        attrs = AttributeState()
        P = np.concatenate([_straight_cp(), _straight_cp() + [1, 0, 0]])
        g = build_curves(
            "linear", [4, 4], "nonperiodic",
            {"P": P.reshape(-1), "constantwidth": [0.1]},
            np.eye(4), True, attrs,
        )
        assert g.ntriangles == 2 * 3 * TUBE_SIDES * 2


class TestFurRender:
    def test_fur_patch_renders(self, tmp_path):
        """A fur demo: strands on a ground patch, rendered end-to-end
        through the RIB front end (FurRender's main.cpp scene shape)."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        rng = np.random.default_rng(11)
        curves = []
        nv = []
        for _ in range(40):
            x, z = rng.uniform(-1.5, 1.5, 2)
            lean = rng.uniform(-0.4, 0.4, 2)
            cp = np.array(
                [
                    [x, 0.0, z],
                    [x + 0.3 * lean[0], 0.7, z + 0.3 * lean[1]],
                    [x + 0.8 * lean[0], 1.3, z + 0.8 * lean[1]],
                    [x + lean[0], 1.8, z + lean[1]],
                ]
            )
            curves.append(cp)
            nv.append(4)
        P = " ".join(
            f"{v:.4f}" for v in np.concatenate(curves).reshape(-1)
        )
        nvs = " ".join(str(v) for v in nv)
        s = RiState()
        parse_rib(
            f'Display "{tmp_path}/fur.hdr" "file" "rgb"\n'
            "PixelSamples 1 1\n"
            'Projection "perspective" "fov" [45]\n'
            'Orientation "rh"\n'
            "ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  0 -1 -6 1]\n"
            "WorldBegin\n"
            'PointsPolygons [4] [0 3 2 1] "P" '
            '[-3 0 -3  3 0 -3  3 0 3  -3 0 3]\n'
            f'Curves "cubic" [{nvs}] "nonperiodic" "P" [{P}] '
            '"constantwidth" [0.06]\n'
            "WorldEnd\n",
            s,
        )
        s.Format(64, 48)
        s.options.gather_nsamples = 4
        r = Renderer(s.scene, tile_size=32)
        img = np.asarray(r.render_frame())
        assert img.shape == (48, 64, 3)
        assert np.isfinite(img).all()
        # strands occlude the ground: AO darkening where fur stands
        assert img.mean() > 0.01
        ntris = sum(g.ntriangles for g in s.scene.geoms)
        assert ntris > 40 * 8 * TUBE_SIDES  # strands actually tessellated
