"""RSL-subset compiler tests, incl. the reference shader corpus."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lucille_tpu.shading.sl import SLError, compile_sl, parse_sl

REF_SHADERS = "/root/reference/shaders"


def _sg_ctx(B=4):
    from lucille_tpu.lights.tables import build_light_tables
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib
    from lucille_tpu.scene.compile import compile_scene
    from lucille_tpu.shading.shader import ShaderContext, ShaderGlobals

    s = RiState()
    parse_rib(
        'WorldBegin\nPointsPolygons [4] [0 1 2 3] '
        '"P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]\nWorldEnd',
        s,
    )
    scene = compile_scene(s.scene).device_put()
    lights = build_light_tables(s.scene)
    z = jnp.zeros((B, 3))
    o = jnp.ones((B, 3))
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
    sg = ShaderGlobals(
        P=z + jnp.asarray([0.0, 0.5, 0.0]),
        N=up, Ng=up, I=-up, E=z, Cs=o * 0.8, Os=o,
        s=jnp.linspace(0, 1, B), t=jnp.linspace(0, 1, B),
        u=jnp.zeros(B), v=jnp.zeros(B), dPdu=z, dPdv=z,
    )
    ctx = ShaderContext(scene=scene, key=jax.random.key(0), lights=lights)
    return sg, ctx


class TestParse:
    def test_minimal_surface(self):
        ast = parse_sl("surface s() { Ci = Cs; }")
        assert ast.name == "s"
        assert ast.kind == "surface"

    def test_params_with_defaults(self):
        ast = parse_sl("surface s(float Ka = 1; color C = (1, 0, 0);) { }")
        assert [p[1] for p in ast.params] == ["Ka", "C"]

    def test_dot_product_operator(self):
        ast = parse_sl("surface s() { float d = I.N; }")
        assert ast is not None

    def test_reports_error_on_garbage(self):
        with pytest.raises(SLError):
            parse_sl("this is not a shader")


class TestExecute:
    def test_constant(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl("surface c() { Ci = Cs; Oi = Os; }")
        ci, oi = fn(sg, d, ctx)
        np.testing.assert_allclose(np.asarray(ci), 0.8, atol=1e-6)

    def test_param_override(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl("surface k(float K = 0.5) { Ci = K * Cs; }")
        ci, _ = fn(sg, {"K": 0.25}, ctx)
        np.testing.assert_allclose(np.asarray(ci), 0.2, atol=1e-6)

    def test_varying_if_merges(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(
            "surface f() { float x = 0; if (s > 0.5) { x = 1; } else { x = 2; } Ci = x; }"
        )
        ci, _ = fn(sg, d, ctx)
        vals = np.asarray(ci[:, 0])
        s_vals = np.linspace(0, 1, 4)
        np.testing.assert_allclose(vals, np.where(s_vals > 0.5, 1.0, 2.0))

    def test_for_loop_unrolls(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(
            "surface f() { float acc = 0; float i; "
            "for (i = 0; i < 5; i += 1) { acc += 2; } Ci = acc; }"
        )
        ci, _ = fn(sg, d, ctx)
        np.testing.assert_allclose(np.asarray(ci[:, 0]), 10.0)

    def test_builtin_math(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(
            "surface f() { Ci = mix((0,0,0), (1,1,1), 0.25) + clamp(2.0, 0, 1) - 1; }"
        )
        ci, _ = fn(sg, d, ctx)
        np.testing.assert_allclose(np.asarray(ci), 0.25, atol=1e-6)

    def test_occlusion_shader_runs_under_jit(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(
            'surface ao(float samples = 4) '
            "{ Ci = Cs * (1 - occlusion(P, N, samples)); }"
        )
        jitted = jax.jit(lambda sg: fn(sg, d, ctx)[0])
        ci = jitted(sg)
        # open plane: nothing above it occludes -> Ci == Cs
        np.testing.assert_allclose(np.asarray(ci), 0.8, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_SHADERS), reason="reference unavailable")
class TestReferenceCorpus:
    def test_parses_all_wellformed_shaders(self):
        """All bundled .sl files except turbulence.sl, which has an
        unbalanced-paren syntax error in the reference source itself."""
        bad = {"turbulence.sl"}
        failures = []
        for path in sorted(glob.glob(os.path.join(REF_SHADERS, "*.sl"))):
            name = os.path.basename(path)
            try:
                compile_sl(open(path).read())
            except SLError:
                if name not in bad:
                    failures.append(name)
        assert not failures, failures

    def test_matte_executes(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(open(os.path.join(REF_SHADERS, "matte.sl")).read())
        ci, oi = fn(sg, d, ctx)
        assert np.isfinite(np.asarray(ci)).all()

    def test_whitted_executes(self):
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(open(os.path.join(REF_SHADERS, "whitted.sl")).read())
        ci, _ = fn(sg, d, ctx)
        assert np.isfinite(np.asarray(ci)).all()

    def test_shader_gradients_flow(self):
        """Differentiability: d(Ci)/d(Kd) for matte.sl is well-defined."""
        sg, ctx = _sg_ctx()
        fn, d = compile_sl(open(os.path.join(REF_SHADERS, "matte.sl")).read())

        def loss(kd):
            ci, _ = fn(sg, {"Ka": 0.0, "Kd": kd}, ctx)
            return jnp.sum(ci)

        g = jax.grad(loss)(0.7)
        assert np.isfinite(float(g))
