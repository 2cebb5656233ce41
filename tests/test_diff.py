"""Differentiable-rendering tests: autodiff vs finite differences, and a
short inverse-rendering optimization (BASELINE backward-parity target)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _setup(width=24, height=16):
    from lucille_tpu.diff.render import differentiable_render
    from lucille_tpu.lights.tables import build_light_tables
    from lucille_tpu.render.renderer import _FrozenCamera
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib
    from lucille_tpu.scene.compile import compile_scene

    s = RiState()
    parse_rib(
        'Projection "perspective" "fov" [45]\nOrientation "rh"\n'
        "ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  0 -2 -8 1]\n"
        "WorldBegin\n"
        'LightSource "domelight" 1 "intensity" [1.0]\n'
        'PointsPolygons [4] [0 3 2 1] "P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]\n'
        "AttributeBegin\n"
        'Color [0.9 0.4 0.2]\n'
        'PointsPolygons [3] [0 1 2] "P" [-1 0.5 -1  1 0.5 -1  0 2.5 0]\n'
        "AttributeEnd\n"
        "WorldEnd\n",
        s,
    )
    s.Format(width, height)
    s.camera.setup(s.world_to_camera, s.options.orientation)
    scene = compile_scene(s.scene).device_put()
    lights = build_light_tables(s.scene)
    camera = _FrozenCamera.from_camera(s.camera)
    render_fn, params = differentiable_render(
        scene, lights, camera, width, height, spp=2, max_depth=3
    )
    return render_fn, params


class TestGradients:
    def test_grad_matches_finite_difference(self):
        render_fn, params = _setup()
        key = jax.random.key(7)

        def loss(kd):
            p = dict(params, mat_kd=kd)
            return jnp.mean(render_fn(p, key))

        kd0 = params["mat_kd"]
        g = jax.grad(loss)(kd0)

        eps = 1e-2
        for gi in range(kd0.shape[0]):
            e = jnp.zeros_like(kd0).at[gi].set(eps)
            fd = (float(loss(kd0 + e)) - float(loss(kd0 - e))) / (2 * eps)
            # same sampling keys => common random numbers: tight match
            assert float(g[gi]) == pytest.approx(fd, abs=2e-3), f"geom {gi}"

    def test_color_gradient_is_positive_where_visible(self):
        render_fn, params = _setup()
        key = jax.random.key(3)

        def loss(c):
            p = dict(params, mat_color=c)
            return jnp.mean(render_fn(p, key))

        g = jax.grad(loss)(params["mat_color"])
        # brightening any visible material brightens the mean image
        assert float(np.asarray(g).sum()) > 0.0

    def test_emission_gradient_flows(self):
        render_fn, params = _setup()
        key = jax.random.key(4)

        def loss(e):
            p = dict(params, mat_emission=e)
            return jnp.mean(render_fn(p, key))

        g = jax.grad(loss)(params["mat_emission"])
        assert np.isfinite(np.asarray(g)).all()


class TestLightAndSpecularParams:
    def test_light_intensity_gradient_matches_fd(self):
        """d(loss)/d(light_intensity) vs central finite differences
        (BASELINE config 5: light params differentiable)."""
        render_fn, params = _setup()
        key = jax.random.key(9)

        def loss(li):
            p = dict(params, light_intensity=li)
            return jnp.mean(render_fn(p, key))

        li0 = params["light_intensity"]
        g = jax.grad(loss)(li0)
        eps = 1e-2
        for i in range(li0.shape[0]):
            e = jnp.zeros_like(li0).at[i].set(eps)
            fd = (float(loss(li0 + e)) - float(loss(li0 - e))) / (2 * eps)
            assert float(g[i]) == pytest.approx(fd, abs=2e-3), f"light {i}"
        # a brighter dome brightens the image
        assert float(np.asarray(g).sum()) > 0.0

    def test_light_color_gradient_flows(self):
        render_fn, params = _setup()
        key = jax.random.key(10)

        def loss(lc):
            p = dict(params, light_color=lc)
            return jnp.mean(render_fn(p, key))

        g = np.asarray(jax.grad(loss)(params["light_color"]))
        assert np.isfinite(g).all()
        assert g.sum() > 0.0

    def test_mat_ks_in_template_and_grad_finite(self):
        render_fn, params = _setup()
        assert "mat_ks" in params
        key = jax.random.key(12)

        def loss(ks):
            p = dict(params, mat_ks=ks)
            return jnp.mean(render_fn(p, key))

        g = np.asarray(jax.grad(loss)(params["mat_ks"]))
        assert np.isfinite(g).all()


class TestInverseRendering:
    def test_recovers_kd_and_light_jointly(self):
        """Joint (kd, light intensity) recovery — BRDF + light params
        optimized together from pixel loss (BASELINE config 5)."""
        import optax

        render_fn, params = _setup(width=16, height=12)
        key = jax.random.key(21)

        kd_true = jnp.asarray([0.4, 0.8])
        li_true = jnp.asarray([1.6])
        target = render_fn(
            dict(params, mat_kd=kd_true, light_intensity=li_true), key
        )

        theta = {"mat_kd": jnp.asarray([0.6, 0.5]),
                 "light_intensity": jnp.asarray([1.0])}
        opt = optax.adam(0.05)
        state = opt.init(theta)

        @jax.jit
        def step(theta, state):
            def loss_fn(th):
                img = render_fn(dict(params, **th), key)
                return jnp.mean((img - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(theta)
            updates, state = opt.update(g, state)
            return optax.apply_updates(theta, updates), state, loss

        for _ in range(80):
            theta, state, loss = step(theta, state)

        assert float(loss) < 5e-4
        # kd*light is what pixels constrain; check the PRODUCT matches
        # closely and individual params are in the right region
        got = np.asarray(theta["mat_kd"]) * float(theta["light_intensity"][0])
        want = np.asarray(kd_true) * float(li_true[0])
        np.testing.assert_allclose(got, want, rtol=0.12)

    def test_recovers_material_kd(self):
        """Optimize kd to match a target rendered with known kd."""
        import optax

        render_fn, params = _setup(width=16, height=12)
        key = jax.random.key(11)

        kd_true = jnp.asarray([0.3, 0.85])
        target = render_fn(dict(params, mat_kd=kd_true), key)

        kd = jnp.asarray([0.6, 0.5])
        opt = optax.adam(0.05)
        state = opt.init(kd)

        @jax.jit
        def step(kd, state):
            def loss_fn(k):
                img = render_fn(dict(params, mat_kd=k), key)
                return jnp.mean((img - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(kd)
            updates, state = opt.update(g, state)
            return optax.apply_updates(kd, updates), state, loss

        for _ in range(60):
            kd, state, loss = step(kd, state)

        got = np.asarray(kd)
        want = np.asarray(kd_true)
        assert float(loss) < 1e-4
        np.testing.assert_allclose(got, want, atol=0.05)
