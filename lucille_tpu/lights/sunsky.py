"""Preetham analytic sun & sky model.

Equivalent capability to lucille's src/render/sunsky.c (spectral sun
attenuation sunsky.c:78, sky spectrum→RGB sunsky.c:330-418, lat/long/
time-of-day solar position sunsky.c:184), after:

    A. J. Preetham, P. Shirley, B. Smits,
    "A Practical Analytic Model for Daylight", SIGGRAPH 1999.

Implementation is a fresh, vectorized JAX/NumPy expression of the published
model: solar position from latitude/longitude/date, Perez luminance /
chromaticity distribution, and xyY→RGB conversion.  `sky_rgb` is pure jnp
and usable inside jit (the sky texture is baked host-side once per scene,
matching the reference's create_sunsky_image, lightsource.c:125).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


def _perez(theta, gamma, A, B, C, D, E, xp):
    cg = xp.cos(gamma)
    return (1.0 + A * xp.exp(B / xp.maximum(xp.cos(theta), 1e-4))) * (
        1.0 + C * xp.exp(D * gamma) + E * cg * cg
    )


# CIE xyY -> linear sRGB-ish primaries (D65), rows are row-vector matrices.
_XYZ2RGB = np.array(
    [
        [3.2404542, -0.9692660, 0.0556434],
        [-1.5371385, 1.8760108, -0.2040259],
        [-0.4985314, 0.0415560, 1.0572252],
    ]
)


@dataclass
class PreethamSunSky:
    """Sun + sky parameter block (reference ri_sunsky_t).

    Default site parameters mirror the reference's defaults
    (sunsky.c:184 ff): turbidity 2.0; lat/long in degrees; `hour` is local
    solar time; `standard_meridian` in degrees.
    """

    # defaults = the reference's (Tokyo, Jan 20, 10:30;
    # lightsource.c:293-300); standard_meridian in DEGREES (= the RIB
    # token's timezone x 15, ri_sunsky_init sunsky.c:207)
    latitude: float = 35.39
    longitude: float = 139.44
    standard_meridian: float = 135.0
    month: float = 1.0
    day: float = 20.0
    hour: float = 10.5
    turbidity: float = 2.0
    julian_day: float | None = None  # overrides month/day when given
    overcast: float = 0.0
    sun_scale: float = 1.0

    def __post_init__(self):
        self._compute_sun_position()
        self._compute_distribution()

    # -- solar position (init_sun_theta_phi, sunsky.c:40-75) -------------

    def _compute_sun_position(self):
        jd = (
            float(self.julian_day)
            if self.julian_day is not None
            else (self.month - 1.0) * 30.4 + self.day
        )
        solar_time = (
            self.hour
            + 0.170 * math.sin(4.0 * math.pi * (jd - 80.0) / 373.0)
            - 0.129 * math.sin(2.0 * math.pi * (jd - 8.0) / 355.0)
            + (self.standard_meridian - self.longitude) / 15.0
        )
        declination = 0.4093 * math.sin(2.0 * math.pi * (jd - 81.0) / 368.0)
        lat = math.radians(self.latitude)
        h = math.pi * solar_time / 12.0
        theta_s = math.pi / 2.0 - math.asin(
            math.sin(lat) * math.sin(declination)
            - math.cos(lat) * math.cos(declination) * math.cos(h)
        )
        # azimuth exactly as the reference computes it (sunsky.c:66-73)
        opp = -math.cos(declination) * math.sin(h)
        adj = -(
            math.cos(lat) * math.sin(declination)
            + math.sin(lat) * math.cos(declination) * math.cos(h)
        )
        phi_s = -math.atan2(opp, adj)
        self.theta_s = theta_s
        self.phi_s = phi_s

    def sun_direction(self) -> np.ndarray:
        """Unit vector toward the sun, z-up frame (as ri_sunsky_t.sun_dir)."""
        st, ct = math.sin(self.theta_s), math.cos(self.theta_s)
        sp, cp = math.sin(self.phi_s), math.cos(self.phi_s)
        return np.array([st * cp, st * sp, ct])

    # -- Perez distribution coefficients ---------------------------------

    def _compute_distribution(self):
        T = self.turbidity
        th = self.theta_s
        # zenith luminance (Kcd/m^2) and chromaticities (Preetham A.2)
        chi = (4.0 / 9.0 - T / 120.0) * (math.pi - 2.0 * th)
        self.Yz = (4.0453 * T - 4.9710) * math.tan(chi) - 0.2155 * T + 2.4192
        t2, t1 = T * T, T
        v = np.array([th**3, th**2, th, 1.0])
        self.xz = float(
            np.array([t2, t1, 1.0])
            @ np.array(
                [
                    [0.00166, -0.00375, 0.00209, 0.0],
                    [-0.02903, 0.06377, -0.03202, 0.00394],
                    [0.11693, -0.21196, 0.06052, 0.25886],
                ]
            )
            @ v
        )
        self.yz = float(
            np.array([t2, t1, 1.0])
            @ np.array(
                [
                    [0.00275, -0.00610, 0.00317, 0.0],
                    [-0.04214, 0.08970, -0.04153, 0.00516],
                    [0.15346, -0.26756, 0.06670, 0.26688],
                ]
            )
            @ v
        )
        # Perez coefficients for Y, x, y (Preetham A.2)
        self.AY, self.BY = 0.1787 * T - 1.4630, -0.3554 * T + 0.4275
        self.CY, self.DY = -0.0227 * T + 5.3251, 0.1206 * T - 2.5771
        self.EY = -0.0670 * T + 0.3703
        self.Ax, self.Bx = -0.0193 * T - 0.2592, -0.0665 * T + 0.0008
        self.Cx, self.Dx = -0.0004 * T + 0.2125, -0.0641 * T - 0.8989
        self.Ex = -0.0033 * T + 0.0452
        self.Ay, self.By = -0.0167 * T - 0.2608, -0.0950 * T + 0.0092
        self.Cy, self.Dy = -0.0079 * T + 0.2102, -0.0441 * T - 1.6537
        self.Ey = -0.0109 * T + 0.0529

    # -- sky radiance ----------------------------------------------------

    def sky_rgb(self, directions):
        """Linear-RGB sky radiance for unit direction(s), z-up frame.

        Works with NumPy or jnp arrays (jit-safe); directions below the
        horizon return black.
        """
        xp = np
        if type(directions).__module__.startswith("jax"):
            import jax.numpy as jnp

            xp = jnp
        d = directions
        cz = d[..., 2]
        theta = xp.arccos(xp.clip(cz, -1.0, 1.0))
        sdir = self.sun_direction()
        cgamma = xp.clip(
            d[..., 0] * sdir[0] + d[..., 1] * sdir[1] + d[..., 2] * sdir[2],
            -1.0,
            1.0,
        )
        gamma = xp.arccos(cgamma)
        ths = self.theta_s

        def ratio(A, B, C, D, E):
            num = _perez(theta, gamma, A, B, C, D, E, xp)
            den = _perez(
                xp.asarray(0.0), xp.asarray(ths), A, B, C, D, E, xp
            )
            return num / den

        Y = self.Yz * ratio(self.AY, self.BY, self.CY, self.DY, self.EY)
        x = self.xz * ratio(self.Ax, self.Bx, self.Cx, self.Dx, self.Ex)
        y = self.yz * ratio(self.Ay, self.By, self.Cy, self.Dy, self.Ey)

        # xyY -> XYZ -> RGB (specrend-style colorimetry, sunsky.c:330-418);
        # Y converts kcd/m^2 -> cd/m^2 exactly like the reference
        # (zenith_Y *= 1000, sunsky.c:254) so absolute sky radiance
        # matches CPU-lucille's HDR output scale
        y_safe = xp.maximum(y, 1e-5)
        Ycd = Y * 1000.0
        X = x / y_safe * Ycd
        Z = (1.0 - x - y) / y_safe * Ycd
        XYZ = xp.stack([X, Ycd, Z], axis=-1)
        rgb = XYZ @ xp.asarray(_XYZ2RGB)  # row-vector form: _XYZ2RGB is M^T
        rgb = xp.maximum(rgb, 0.0)
        above = (cz > 0.0)[..., None]
        return xp.where(above, rgb, xp.zeros_like(rgb))

    # RADIANCE amplitude calibrated against the reference's spectral sun
    # (compute_attenuated_sunlight -> xyz_to_rgb): ratio measured 5.0e5 -
    # 5.2e5 across times of day / turbidities (4.0e5 at very low sun)
    _SUN_AMPLITUDE = 5.1e5

    def sunlight_rgb(self) -> np.ndarray:
        """Sun disc radiance as RGB (ri_sunsky_get_sunlight_rgb).

        Spectral direct-beam attenuation condensed to a 3-band heuristic
        (Rayleigh + aerosol optical depth at representative wavelengths,
        scaled by air mass) with amplitude calibrated to the reference's
        spectral pipeline; zero below the horizon (sunsky.c:225-230).
        Chromaticity matches the spectral path within ~7%; magnitude
        within ~25% at extreme sun angles (test_sunsky_golden.py).
        """
        if self.theta_s >= 0.5 * math.pi:
            return np.zeros(3) * self.sun_scale
        th = min(self.theta_s, math.radians(89.9))
        m = 1.0 / (math.cos(th) + 0.15 * (93.885 - math.degrees(th)) ** -1.253)
        beta = 0.04608 * self.turbidity - 0.04586
        wavelengths = np.array([0.610, 0.550, 0.470])  # um, R/G/B-ish
        tau_r = np.exp(-m * 0.008735 * wavelengths**-4.08)
        tau_a = np.exp(-m * beta * wavelengths**-1.3)
        return tau_r * tau_a * (self.sun_scale * self._SUN_AMPLITUDE)
