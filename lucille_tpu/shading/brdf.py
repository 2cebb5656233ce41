"""BRDF library: lambert, blinn, phong, modified-phong, Ward anisotropic,
Ashikhmin-Shirley.

Vectorized, differentiable JAX re-expression of src/render/brdf.c:22-467,
preserving each model's conventions (including quirks like blinn's
half-vector z-component, brdf.c:39-55).  `wo` is the outgoing (view)
direction, `wi` the incident (light) direction, both pointing AWAY from
the surface point; `n` the shading normal; all (..., 3) float32.

Importance sampling: `sample_modified_phong` mirrors
ri_sample_modified_phong (brdf.c:431-462).
"""

from __future__ import annotations

import jax.numpy as jnp

from lucille_tpu.shading.reflection import cosn_sample, fresnel_schlick, reflect


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def lambert(wo, wi, n, kd):
    """kd * max(wi.n, 0)  (brdf.c:22-37 — note: not divided by pi)."""
    del wo
    ldotn = _dot(wi, n)
    return jnp.where(ldotn > 0.0, kd * ldotn, 0.0)


def blinn(wo, wi, n, kd, ks, glossness):
    """kd + ks * half.z^gloss  (brdf.c:39-55; half vector in local frame
    where z is up — callers pass tangent-frame vectors)."""
    del n
    h = _norm(wo + wi)
    return kd + ks * jnp.power(jnp.maximum(h[..., 2], 0.0), glossness)


def phong(wo, wi, n, kd, ks, glossness):
    """kd/pi + ks * (r.wi)^gloss / (n.wi)  (brdf.c:58-82).

    The reference passes the *incident* view ray as its view vector
    (ri_reflect flips it back above the surface); with our away-facing
    `wo` convention the mirror direction is reflect(-wo, n).
    """
    r = reflect(-wo, n)
    rdotl = _dot(r, wi)
    ndotl = _dot(n, wi)
    ok = (rdotl > 0.0) & (ndotl > 0.0)
    spec = ks * jnp.power(jnp.maximum(rdotl, 1e-20), glossness) / jnp.maximum(
        ndotl, 1e-20
    )
    return jnp.where(ok, kd / jnp.pi + spec, 0.0)


def modified_phong(wo, wi, n, kd, ks, glossness):
    """Physically-correct Lafortune-Willems modified Phong (brdf.c:91-123):
    kd/pi + ks (gloss+2)/(2 pi) (r.wi)^gloss."""
    rdotl = jnp.clip(_dot(reflect(-wo, n), wi), 0.0, 1.0)
    diffuse = kd / jnp.pi
    specular = ks * (glossness + 2.0) / (2.0 * jnp.pi) * jnp.power(
        jnp.maximum(rdotl, 1e-20), glossness
    )
    return jnp.where(rdotl > 0.0, diffuse + specular, 0.0)


def ward_anisotropic(wo, wi, n, u, v, kd, ks, ax, ay):
    """Ward's anisotropic BRDF (brdf.c:129-232; Ward SIGGRAPH 1992).

    Preserves the reference's structure: half vector h = reflect(wo, n) + wi
    (NOT wo + wi — a reference quirk), falls back to the diffuse term when
    either cosine is non-positive.
    """
    diffuse = kd / jnp.pi
    r = reflect(-wo, n)
    costr = _dot(r, n)
    costi = _dot(wi, n)
    h = _norm(r + wi)
    hdotn = _dot(h, n)
    hdotx = _dot(h, u)
    hdoty = _dot(h, v)
    c1 = 1.0 / jnp.sqrt(jnp.maximum(costi * costr, 1e-12))
    c2 = 1.0 / (4.0 * jnp.pi * ax * ay)
    c3 = ((hdotx / ax) ** 2 + (hdoty / ay) ** 2) / jnp.maximum(
        1.0 + hdotn, 1e-8
    )
    specular = ks * c1 * c2 * jnp.exp(-2.0 * c3)
    ok = (costr > 0.0) & (costi > 0.0)
    return jnp.where(ok, diffuse + specular, diffuse)


def ashikhmin_shirley(wo, wi, n, u, v, kd_rgb, ks_rgb, nu, nv):
    """Ashikhmin-Shirley anisotropic BRDF (brdf.c:234-312).

    Returns (..., 3) RGB reflectance: coupled diffuse term + anisotropic
    specular lobe with Schlick Fresnel.
    """
    h = _norm(wo + wi)
    ndotwi = jnp.maximum(_dot(n, wi), 0.0)
    ndotwo = jnp.maximum(_dot(n, wo), 0.0)
    ndoth = jnp.maximum(_dot(n, h), 0.0)
    hdotwi = jnp.maximum(_dot(h, wi), 1e-8)
    hdotu = _dot(h, u)
    hdotv = _dot(h, v)

    # specular lobe
    denom_aniso = jnp.maximum(1.0 - ndoth * ndoth, 1e-8)
    expo = (nu * hdotu**2 + nv * hdotv**2) / denom_aniso
    num = jnp.sqrt((nu + 1.0) * (nv + 1.0)) / (8.0 * jnp.pi)
    lobe = num * jnp.power(ndoth, expo) / (
        hdotwi * jnp.maximum(ndotwi, ndotwo)
    )
    f = fresnel_schlick(hdotwi[..., None], ks_rgb)
    specular = lobe[..., None] * f

    # coupled diffuse
    c = 28.0 / (23.0 * jnp.pi)
    d1 = 1.0 - (1.0 - ndotwi / 2.0) ** 5
    d2 = 1.0 - (1.0 - ndotwo / 2.0) ** 5
    diffuse = c * kd_rgb * (1.0 - ks_rgb) * (d1 * d2)[..., None]

    ok = ((ndotwi > 0.0) & (ndotwo > 0.0))[..., None]
    return jnp.where(ok, diffuse + specular, 0.0)


def sample_modified_phong(wi, n, u0, u1, glossness):
    """Importance-sample the modified-phong glossy lobe
    (ri_sample_modified_phong, brdf.c:431-462): a cos^N direction around
    the reflection of `wi` about `n`.  Returns (wo, pdf)."""
    refdir = reflect(wi, n)
    return cosn_sample(u0, u1, _norm(refdir), glossness)
