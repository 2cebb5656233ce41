"""End-to-end IBL: env textures actually illuminate scenes.

Covers the reference pipeline RIB token -> light->texture +
light->iblsampler (lightsource.c:127-142) -> per-direction env fetch in
the gather (ibl.c:53-540, texture.c:238), which round 2 left unwired.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _hemi_env(w=64, h=32, top=(4.0, 0.1, 0.1), bottom=(0.1, 0.1, 4.0)):
    """Lat-long map: upper hemisphere `top` color, lower `bottom`."""
    img = np.zeros((h, w, 3), np.float32)
    img[: h // 2] = top
    img[h // 2 :] = bottom
    return img


def _split_env(w=64, h=32, left=(5.0, 0.0, 0.0), right=(0.0, 0.0, 5.0)):
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = left
    img[:, w // 2 :] = right
    return img


def _plane_with_ibl(tmp_path, env_img, sampler="cosweight", rib_extra=""):
    from lucille_tpu.imageio.rgbe import write_hdr
    from lucille_tpu.lights.tables import build_light_tables
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib
    from lucille_tpu.scene.compile import compile_scene

    path = tmp_path / "env.hdr"
    write_hdr(path, env_img)
    s = RiState()
    parse_rib(
        "WorldBegin\n"
        f'LightSource "ibl" 1 "texture" ["{path}"] "sampling" ["{sampler}"]\n'
        'PointsPolygons [4] [0 3 2 1] "P" '
        '[-50 0 -50  50 0 -50  50 0 50  -50 0 50]\n'
        + rib_extra
        + "WorldEnd\n",
        s,
    )
    scene = compile_scene(s.scene).device_put()
    lights = build_light_tables(s.scene)
    return s, scene, lights


class TestEnvMapFetch:
    def test_latlong_fetch_directions(self):
        from lucille_tpu.lights.envmap import EnvMap

        env = EnvMap(_hemi_env())  # 2:1 -> latlong
        assert env.mapping == "latlong"
        up = env.fetch(jnp.asarray([[0.0, 1.0, 0.0]]))
        down = env.fetch(jnp.asarray([[0.0, -1.0, 0.0]]))
        assert float(up[0, 0]) > 1.0  # top is red
        assert float(down[0, 2]) > 1.0  # bottom is blue

    def test_angular_roundtrip_vs_latlong(self):
        """angular->latlong conversion preserves the directional signal."""
        from lucille_tpu.lights.envmap import EnvMap, angular_to_latlong

        # build an angular map from the analytic hemisphere env: color by
        # the y of the decoded direction
        n = 64
        ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        px = (xs + 0.5) / n * 2 - 1
        py = 1 - (ys + 0.5) / n * 2
        r = np.sqrt(px**2 + py**2)
        theta = np.clip(r, 0, 1) * np.pi
        # angular: dir = (sin sin, ...) with -z at r=0; reconstruct dir.y
        phi = np.arctan2(py, px)
        sin_t = np.sin(theta)
        d = np.stack(
            [sin_t * np.cos(phi), sin_t * np.sin(phi), -np.cos(theta)], -1
        )
        img = np.where(d[..., 1:2] > 0, [[4.0, 0.1, 0.1]], [[0.1, 0.1, 4.0]])
        env = EnvMap(img.astype(np.float32))  # square -> angular
        assert env.mapping == "angular"
        up = env.fetch(jnp.asarray([[0.0, 1.0, 0.0]]))
        assert float(up[0, 0]) > 1.0
        ll = angular_to_latlong(env.image)
        assert ll[2].mean(axis=0)[0] > 1.0  # top rows red


class TestIBLLighting:
    @pytest.mark.slow  # irradiance-level check covered by the sampler
    # matrix + background tests; ~9 s
    def test_domelight_renders_map_colors(self, tmp_path):
        """A textured IBL light illuminates an upward-facing plane with
        the UPPER hemisphere's color (red), not the flat light color."""
        from lucille_tpu.lights.sampling import light_contribution

        _, scene, lights = _plane_with_ibl(tmp_path, _hemi_env())
        light = lights.lights[0]
        assert light.env is not None
        P = jnp.asarray([[0.0, 0.01, 0.0]] * 8)
        N = jnp.asarray([[0.0, 1.0, 0.0]] * 8)
        e = light_contribution(
            scene, light, P, N, jax.random.key(0), nsamples=64
        )
        e = np.asarray(e).mean(axis=0)
        # upper hemisphere is (4, .1, .1): irradiance ~= pi * that
        assert e[0] > 5.0 and e[0] > 10 * e[2]
        assert e[0] == pytest.approx(np.pi * 4.0, rel=0.25)

    def test_background_radiance_fetches_env(self, tmp_path):
        from lucille_tpu.transport.common import background_radiance

        _, scene, lights = _plane_with_ibl(tmp_path, _hemi_env())
        up = background_radiance(lights, jnp.asarray([[0.0, 1.0, 0.0]]))
        down = background_radiance(lights, jnp.asarray([[0.0, -1.0, 0.0]]))
        assert float(up[0, 0]) > 1.0
        assert float(down[0, 2]) > 1.0

    @pytest.mark.parametrize(
        "sampler",
        [
            "importance",
            "stratified",
            "structured",
            # bruteforce integrates every texel per lane: ~370 s on this
            # container — opt-in (-m "slow or not slow")
            pytest.param("bruteforce", marks=pytest.mark.slow),
        ],
    )
    def test_samplers_see_the_texture(self, tmp_path, sampler):
        """Every sampler token produces the map's directional color —
        and produces a DIFFERENT estimator than cosweight (the token is
        honored, lightsource.c:127-142)."""
        from lucille_tpu.lights.sampling import light_contribution

        # direction-dependent map (not hemisphere-constant, for which
        # cosweight and stratified are both exact and coincide)
        env = _hemi_env()
        env[: env.shape[0] // 4] *= 3.0  # extra-bright zenith band
        _, scene, lights = _plane_with_ibl(tmp_path, env, sampler)
        light = lights.lights[0]
        assert light.ibl_sampler == sampler
        P = jnp.asarray([[0.0, 0.01, 0.0]] * 4)
        N = jnp.asarray([[0.0, 1.0, 0.0]] * 4)
        e = np.asarray(
            light_contribution(scene, light, P, N, jax.random.key(1), 16)
        ).mean(axis=0)
        assert e[0] > 2.0 and e[0] > 5 * e[2], (sampler, e)
        from dataclasses import replace

        e_cos = np.asarray(
            light_contribution(
                scene, replace(light, ibl_sampler="cosweight"), P, N,
                jax.random.key(1), 16,
            )
        ).mean(axis=0)
        assert not np.allclose(e, e_cos)

    @pytest.mark.slow  # variance study, ~105 s
    def test_importance_lower_variance_than_cosweight(self, tmp_path):
        """On a map with one bright texel, luminance importance sampling
        beats cosweight at equal sample count (the point of ibl.c's
        sampler menu)."""
        from dataclasses import replace

        from lucille_tpu.lights.sampling import light_contribution

        # a bright REGION big enough that cosweight sometimes hits it
        # (a 1-texel source would never be found by cosweight at 8 spp,
        # making its sample variance meaninglessly zero)
        env = np.full((32, 64, 3), 0.05, np.float32)
        env[2:6, 8:16] = (60.0, 60.0, 60.0)
        _, scene, lights = _plane_with_ibl(tmp_path, env, "importance")
        light = lights.lights[0]
        P = jnp.asarray([[0.0, 0.01, 0.0]])
        N = jnp.asarray([[0.0, 1.0, 0.0]])

        def estimates(smp, nrep=24, ns=8):
            li = replace(light, ibl_sampler=smp)
            return np.array(
                [
                    np.asarray(
                        light_contribution(
                            scene, li, P, N, jax.random.key(i), ns
                        )
                    )[0, 0]
                    for i in range(nrep)
                ]
            )

        imp = estimates("importance")
        cosw = estimates("cosweight")
        assert imp.std() < cosw.std()
        # both unbiased-ish: means within noise of each other
        assert imp.mean() == pytest.approx(cosw.mean(), rel=0.6) or (
            abs(imp.mean() - cosw.mean())
            < 2.0 * (imp.std() + cosw.std()) / np.sqrt(24)
        )


class TestSunskyAO:
    def test_ao_gathers_sky_radiance(self):
        """AO under a sunsky light returns sky COLOR (blue-ish zenith),
        not binary occlusion (ambientocclusion.c:154-332)."""
        from lucille_tpu.lights.tables import build_light_tables
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib
        from lucille_tpu.scene.compile import compile_scene
        from lucille_tpu.transport.ao import ao_radiance

        s = RiState()
        parse_rib(
            "WorldBegin\n"
            'AreaLightSource "sunsky" 1 "hour" [10.0] "turbidity" [2.2]\n'
            'PointsPolygons [4] [0 3 2 1] "P" '
            '[-50 0 -50  50 0 -50  50 0 50  -50 0 50]\n'
            "WorldEnd\n",
            s,
        )
        scene = compile_scene(s.scene).device_put()
        lights = build_light_tables(s.scene)
        org = jnp.asarray([[0.0, 5.0, 0.0]] * 16)
        dirn = jnp.asarray([[0.0, -1.0, 0.0]] * 16)
        rad, aux = ao_radiance(
            scene, org, dirn, jax.random.key(0), 4, 4, lights=lights
        )
        rad = np.asarray(rad).mean(axis=0)
        # sky is colored and non-trivial: not the binary 1.0 of plain AO
        assert rad.sum() > 0.01
        assert abs(rad[2] - rad[0]) > 1e-4  # chromatic, not gray
        plain, _ = ao_radiance(scene, org, dirn, jax.random.key(0), 4, 4)
        assert not np.allclose(np.asarray(plain).mean(axis=0), rad)

    def test_sun_contribution_shadowed(self):
        """A blocker between surface and sun removes the sun term."""
        from lucille_tpu.lights.tables import build_light_tables
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib
        from lucille_tpu.scene.compile import compile_scene
        from lucille_tpu.transport.ao import ao_radiance

        def render(blocker_rib):
            s = RiState()
            parse_rib(
                "WorldBegin\n"
                'AreaLightSource "sunsky" 1 "hour" [12.0]\n'
                'PointsPolygons [4] [0 3 2 1] "P" '
                '[-50 0 -50  50 0 -50  50 0 50  -50 0 50]\n'
                + blocker_rib
                + "WorldEnd\n",
                s,
            )
            scene = compile_scene(s.scene).device_put()
            lights = build_light_tables(s.scene)
            # eye BELOW the roof so the shading point is the ground plane
            # and the roof occludes sun + sky above it
            org = jnp.asarray([[0.0, 1.0, 0.0]] * 8)
            dirn = jnp.asarray([[0.0, -1.0, 0.0]] * 8)
            rad, _ = ao_radiance(
                scene, org, dirn, jax.random.key(3), 3, 3, lights=lights
            )
            return np.asarray(rad).mean()

        open_sky = render("")
        # noon sun is near zenith: a roof just above the shading point
        # blocks both sun and most sky
        roofed = render(
            'PointsPolygons [4] [0 3 2 1] "P" '
            '[-60 2 -60  60 2 -60  60 2 60  -60 2 60]\n'
        )
        assert roofed < 0.25 * open_sky


class TestReferenceSisFile:
    def test_gensamples_dat_loads(self, tmp_path):
        """A reference-toolchain sisfile (tools/sis/sis.c:96-101 text
        format: N / W H / x y r g b rows) loads into the structured
        sampler: pixel coords invert the angular-map parametrization."""
        from lucille_tpu.lights.envmap import EnvMap

        w = h = 64
        # three samples: map center (view axis -z), right edge midline
        # (+x hemisphere boundary), and an off-axis point
        # rho = 0.5 (three-quarter x) is theta = pi/2: the +x direction
        lines = ["3", f"{w} {h}",
                 f"{w//2} {h//2} 5.0 4.0 3.0",
                 f"{3*w//4} {h//2} 1.0 1.0 1.0",
                 f"{w//2 + 8} {h//2} 2.0 2.0 2.0"]
        p = tmp_path / "gensamples.dat"
        p.write_text("\n".join(lines) + "\n")
        env = EnvMap(np.ones((h, w, 3), np.float32), mapping="angular")
        env.load_sis(str(p))
        dirs, rgb = env.file_sis
        assert dirs.shape == (3, 3) and rgb.shape == (3, 3)
        np.testing.assert_allclose(rgb[0], [5.0, 4.0, 3.0])
        # center pixel looks down the view axis (-z), unit length
        assert dirs[0][2] < -0.99
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   atol=1e-5)
        # edge-midline pixel maps near the +x direction (theta ~ pi/2)
        assert dirs[1][0] > 0.9

    def test_npz_still_loads(self, tmp_path):
        from lucille_tpu.lights.envmap import EnvMap

        p = tmp_path / "samples.npz"
        np.savez(p, dirs=np.eye(3, dtype=np.float32),
                 rgb=np.ones((3, 3), np.float32))
        env = EnvMap(np.ones((8, 8, 3), np.float32), mapping="angular")
        env.load_sis(str(p))
        dirs, rgb = env.file_sis
        np.testing.assert_allclose(dirs, np.eye(3))
