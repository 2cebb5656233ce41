"""Reflection/refraction/Fresnel and hemisphere sampling.

Vectorized JAX re-expression of src/render/reflection.c:

- ``reflect`` (reflection.c:26): r = in - 2n(in.n)
- ``refract`` (reflection.c:70): Snell with total-internal-reflection
  fallback to reflection; the incident vector may point either way
  (the reference flips n and eta by the sign of in.n)
- ``fresnel`` (reflection.c:221): exact dielectric coefficients
- ``cosweight_sample`` (reflection.c:131): cosine-weighted hemisphere
- ``cosNweight_sample``: cos^N lobe around an axis (ri_random_vector_
  cosNweight, used by modified-phong importance sampling, brdf.c:462)
- ``ortho_basis`` lives in lucille_tpu.transport.ao (shared).

All functions operate on (..., 3) float32 arrays and trace under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _norm(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def reflect(inc, n):
    """r = inc - 2 n (inc . n)   (reflection.c:26-50)."""
    return inc - 2.0 * _dot(inc, n) * n


def refract(inc, n, eta):
    """Refraction with TIR fallback (reflection.c:70-127).

    Returns (dir, tir_mask).  `eta` is the relative IOR (n2/n1 entering);
    the incident side is inferred from sign(inc . n), as the reference
    does.
    """
    eta = jnp.asarray(eta, jnp.float32)
    if eta.ndim == inc.ndim - 1:  # per-lane eta (B,) against (B, 3) rays
        eta = eta[..., None]
    cos1 = _dot(inc, n)
    entering = cos1 < 0.0
    e = jnp.where(entering, 1.0 / eta, eta)
    N = jnp.where(entering, n, -n)
    c1 = jnp.abs(cos1)
    k = 1.0 - e * e * (1.0 - c1 * c1)
    tir = k <= 0.0
    coeff = e * c1 - jnp.sqrt(jnp.maximum(k, 0.0))
    t = _norm(coeff * N + e * inc)
    r = _norm(reflect(inc, n))
    out = jnp.where(tir, r, t)
    return out, tir[..., 0]


def fresnel(inc, n, eta):
    """Exact dielectric Fresnel (reflection.c:221-312).

    Returns (r_dir, t_dir, kr, kt): reflected/transmitted directions and
    energy coefficients.  kr=1, kt=0 under total internal reflection.
    """
    r = _norm(reflect(inc, n))
    t, tir = refract(inc, n, eta)
    c1 = jnp.abs(_dot(inc, n))[..., 0]
    # g^2 = eta^2 + c^2 - 1 (with eta oriented to the incident side)
    entering = (_dot(inc, n) < 0.0)[..., 0]
    e = jnp.where(entering, eta, 1.0 / eta)
    g2 = e * e + c1 * c1 - 1.0
    g = jnp.sqrt(jnp.maximum(g2, 0.0))
    gpc = g + c1
    gmc = g - c1
    a = jnp.where(gpc > 1e-12, gmc / gpc, 1.0)
    b_num = c1 * gpc - 1.0
    b_den = c1 * gmc + 1.0
    b = jnp.where(jnp.abs(b_den) > 1e-12, b_num / b_den, 0.0)
    kr = 0.5 * a * a * (1.0 + b * b)
    kr = jnp.where(tir, 1.0, jnp.clip(kr, 0.0, 1.0))
    kt = 1.0 - kr
    return r, t, kr, kt


def fresnel_schlick(cos_theta, f0=0.1):
    """Schlick's approximation (brdf.c fresnel_approx: s=0.1)."""
    p = 1.0 - cos_theta
    p5 = (p * p) * (p * p) * p
    return f0 + (1.0 - f0) * p5


def cosweight_sample(u0, u1, basis):
    """Cosine-weighted hemisphere direction (reflection.c:131-160).

    u0, u1: uniforms (...,); basis: (b0, b1, n) each (..., 3).
    Returns (dir (..., 3), pdf (...,)).
    """
    b0, b1, n = basis
    cos_t = jnp.sqrt(jnp.maximum(u0, 0.0))
    phi = 2.0 * jnp.pi * u1
    sin_t = jnp.sqrt(jnp.maximum(1.0 - u0, 0.0))
    x = jnp.cos(phi) * sin_t
    y = jnp.sin(phi) * sin_t
    d = x[..., None] * b0 + y[..., None] * b1 + cos_t[..., None] * n
    pdf = cos_t / jnp.pi
    return d, pdf


def cosn_sample(u0, u1, axis, glossness):
    """cos^N-weighted direction about `axis` (ri_random_vector_cosNweight).

    Used for modified-phong importance sampling (brdf.c:431-462).
    Returns (dir, pdf)."""
    from lucille_tpu.transport.ao import ortho_basis

    b0, b1, a = ortho_basis(axis)
    cos_t = jnp.maximum(u0, 1e-12) ** (1.0 / (glossness + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u1
    d = (
        (jnp.cos(phi) * sin_t)[..., None] * b0
        + (jnp.sin(phi) * sin_t)[..., None] * b1
        + cos_t[..., None] * a
    )
    pdf = (glossness + 1.0) / (2.0 * jnp.pi) * cos_t**glossness
    return d, pdf
