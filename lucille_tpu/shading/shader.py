"""The JAX shader system: surface shaders as traced functions.

Replaces lucille's native shader pipeline — the RSL->C->DSO path
(sl2c, src/sl/; dlopen ABI ``shader->shaderproc(&out, &status, param)``,
attribute.c:372-428 + render/shader.c:972) and the LLVM-JIT shader engine
(src/shader/shaderengine.h:65-69) — with plain Python functions traced by
XLA.  jit IS the shader JIT; shaders are differentiable by construction
and fuse into the surrounding integrator.

Contract (mirrors ri_status_t/ri_input_t/ri_output_t, render/shader.h:27-120):

    shader(sg: ShaderGlobals, params: dict, ctx: ShaderContext)
        -> (Ci (..., 3), Oi (..., 3))

ShaderGlobals carries the standard RSL globals as batched arrays;
ShaderContext exposes the built-in functions that need scene access —
``ambient/diffuse/specular/occlusion/texture/trace``
(render/shader.c:488,504,529,634,895) — implemented against the wavefront
intersectors, with per-call ray budgets like the reference's light-sample
caches (shader.c:36-58).

Shaders are registered by name; ``Surface "matte"`` resolves here instead
of dlopening ``matte.so``.  The RSL-subset front-end in
lucille_tpu.shading.sl compiles .sl source into these same functions
(sl2c capability).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from lucille_tpu.base.log import LOG_WARN, log_once


@jax.tree_util.register_dataclass
@dataclass
class ShaderGlobals:
    """Batched RSL globals (render/shader.h ri_input_t)."""

    P: Any  # (..., 3) surface point
    N: Any  # (..., 3) shading normal
    Ng: Any  # (..., 3) geometric normal
    I: Any  # (..., 3) incident ray direction (unit, toward surface)
    E: Any  # (..., 3) eye/ray origin
    Cs: Any  # (..., 3) surface color
    Os: Any  # (..., 3) surface opacity
    s: Any  # (...,) texture coord
    t: Any  # (...,)
    u: Any  # (...,) barycentric u
    v: Any  # (...,)
    dPdu: Any  # (..., 3) tangent
    dPdv: Any  # (..., 3) binormal


@dataclass
class ShaderContext:
    """Scene access for shader built-ins.

    The integrator constructs one per wavefront; every method is traced
    JAX code over the full batch.
    """

    scene: Any
    key: Any
    lights: Any = None  # LightTables (lucille_tpu.lights.tables)
    textures: Any = None  # TextureAtlas
    nsamples_occlusion: int = 16
    trace_depth_left: int = 0
    trace_fn: Callable | None = None  # set by recursive integrators

    # -- built-ins (render/shader.c) ----------------------------------

    def ambient(self, sg: ShaderGlobals):
        """ambient() — reference returns scene ambient (shader.c:488)."""
        return jnp.zeros_like(sg.P)

    def occlusion(self, sg: ShaderGlobals, nsamples: int | None = None):
        """occlusion(P, N, samples): fraction of the hemisphere blocked —
        the AO kernel (used by shaders/ambientocclusion.sl)."""
        from lucille_tpu.transport.ao import ortho_basis
        from lucille_tpu.accel.dispatch import any_hit

        n = nsamples or self.nsamples_occlusion
        ntheta = max(1, int(n**0.5))
        basis = ortho_basis(sg.N)
        org = sg.P + sg.N * self.scene.eps
        B = sg.P.shape[0]

        def step(occ, si):
            i = (si % ntheta).astype(jnp.float32)
            j = (si // ntheta).astype(jnp.float32)
            k = jax.random.fold_in(self.key, si)
            ur = jax.random.uniform(k, (B, 2), dtype=jnp.float32)
            z0 = (i + ur[:, 0]) / ntheta
            z1 = (j + ur[:, 1]) / ntheta
            cos_t = jnp.sqrt(z0)
            phi = 2.0 * jnp.pi * z1
            lx = jnp.cos(phi) * cos_t
            ly = jnp.sin(phi) * cos_t
            lz = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            d = (
                lx[..., None] * basis[0]
                + ly[..., None] * basis[1]
                + lz[..., None] * basis[2]
            )
            return occ + any_hit(self.scene, org, d).astype(jnp.float32), None

        strata = jnp.arange(ntheta * ntheta, dtype=jnp.int32)
        occ, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), strata)
        return occ / (ntheta * ntheta)

    def diffuse(self, sg: ShaderGlobals):
        """diffuse(N): sum over lights of shadowed cosine lighting
        (shader.c:504 — traces shadow rays to light samples)."""
        if self.lights is None:
            log_once(LOG_WARN, "diffuse() with no lights: returning 0")
            return jnp.zeros_like(sg.P)
        from lucille_tpu.lights.sampling import direct_diffuse

        return direct_diffuse(self.scene, self.lights, sg.P, sg.N, self.key)

    def specular(self, sg: ShaderGlobals, roughness):
        """specular(N, V, roughness) (shader.c:529)."""
        if self.lights is None:
            return jnp.zeros_like(sg.P)
        from lucille_tpu.lights.sampling import direct_specular

        return direct_specular(
            self.scene, self.lights, sg.P, sg.N, -sg.I, roughness, self.key
        )

    def texture(self, name_or_id, s, t):
        """texture(name, s, t) (shader.c:634) via the resident atlas."""
        if self.textures is None:
            log_once(LOG_WARN, "texture() with no atlas: returning 1")
            return jnp.ones(s.shape + (3,), jnp.float32)
        return self.textures.fetch(name_or_id, s, t)

    def trace(self, sg: ShaderGlobals, dirn):
        """trace(P, dir): recursive radiance ray (shader.c:895-925).

        Bounded by trace_depth_left; the integrator wires trace_fn to its
        own bounce evaluation.  The origin is offset ALONG THE TRACED
        DIRECTION (shader.c:918-921), not the normal — refraction rays
        legitimately cross the surface, so a normal offset would pin them
        on the wrong side."""
        if self.trace_fn is None or self.trace_depth_left <= 0:
            return jnp.zeros_like(sg.P)
        return self.trace_fn(sg.P + dirn * self.scene.eps, dirn)


ShaderFn = Callable  # (sg, params, ctx) -> (Ci, Oi)

_SHADERS: dict = {}


def register_shader(name: str, fn: ShaderFn, defaults: dict | None = None):
    _SHADERS[name.lower()] = (fn, dict(defaults or {}))


def get_shader(name: str | None):
    """Resolve a Surface name to (fn, default_params).

    Unknown shaders fall back to matte — the analog of the reference's
    fixed-pipeline fallback when a DSO fails to load (attribute.c:322-337).
    """
    if name and name.lower() in _SHADERS:
        return _SHADERS[name.lower()]
    if name:
        log_once(LOG_WARN, "unknown surface shader '%s'; using matte", name)
    return _SHADERS["matte"]


# ---------------------------------------------------------------------------
# built-in shader library (counterparts of shaders/*.sl)
# ---------------------------------------------------------------------------


def _param(params, name, default):
    v = params.get(name, default)
    return jnp.asarray(v, jnp.float32)


def matte_shader(sg, params, ctx):
    """shaders/matte.sl: Ci = Cs * (Ka*ambient() + Kd*diffuse(N))."""
    ka = _param(params, "Ka", 1.0)
    kd = _param(params, "Kd", 1.0)
    ci = sg.Cs * (ka * ctx.ambient(sg) + kd * ctx.diffuse(sg))
    return ci, sg.Os


def constant_shader(sg, params, ctx):
    """shaders/constant.sl: Ci = Cs."""
    del params, ctx
    return sg.Cs, sg.Os


def plastic_shader(sg, params, ctx):
    """shaders/plastic.sl."""
    ka = _param(params, "Ka", 1.0)
    kd = _param(params, "Kd", 0.5)
    ks = _param(params, "Ks", 0.5)
    roughness = _param(params, "roughness", 0.1)
    speccolor = _param(params, "specularcolor", [1.0, 1.0, 1.0])
    ci = sg.Cs * (ka * ctx.ambient(sg) + kd * ctx.diffuse(sg)) + (
        ks * speccolor * ctx.specular(sg, roughness)
    )
    return ci, sg.Os


def checker_shader(sg, params, ctx):
    """shaders/checker.sl: procedural checkerboard over (s, t)."""
    freq = _param(params, "frequency", 10.0)
    dark = _param(params, "darkcolor", [0.1, 0.1, 0.1])
    light = _param(params, "lightcolor", [1.0, 1.0, 1.0])
    sc = jnp.floor(sg.s * freq).astype(jnp.int32)
    tc = jnp.floor(sg.t * freq).astype(jnp.int32)
    odd = ((sc + tc) % 2).astype(jnp.float32)[..., None]
    base = odd * dark + (1.0 - odd) * light
    ci = base * ctx.diffuse(sg)
    return ci, sg.Os


def ambientocclusion_shader(sg, params, ctx):
    """shaders/ambientocclusion.sl: Ci = Cs * (1 - occlusion(P, N, n))."""
    nsamples = int(params.get("samples", 64))
    occ = ctx.occlusion(sg, nsamples)
    return sg.Cs * (1.0 - occ)[..., None], sg.Os


def mirror_shader(sg, params, ctx):
    """Ideal mirror via trace() (shaders/whitted.sl capability)."""
    kr = _param(params, "Kr", 1.0)
    from lucille_tpu.shading.reflection import reflect

    r = reflect(sg.I, sg.N)
    return kr * ctx.trace(sg, r), sg.Os


register_shader("matte", matte_shader, {"Ka": 1.0, "Kd": 1.0})
register_shader("constant", constant_shader)
register_shader("plastic", plastic_shader,
                {"Ka": 1.0, "Kd": 0.5, "Ks": 0.5, "roughness": 0.1})
register_shader("checker", checker_shader)
register_shader("ambientocclusion", ambientocclusion_shader, {"samples": 64})
register_shader("mirror", mirror_shader, {"Kr": 1.0})
