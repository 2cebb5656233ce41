"""Subsurface single scattering.

Completes the capability sketched (but left unfinished — uninitialized
locals, no light gather) in the reference's src/render/sss.c:40-155: the
single-scattering term of Jensen et al., "A Practical Model for
Subsurface Light Transport" (SIGGRAPH 2001), which sss.c cites in its
comment block:

1. refract the eye ray into the medium (eta ~ 1.4, sss.c:133);
2. sample a scatter depth s' ~ -log(u)/sigma_t along the refracted ray
   (sss.c:119-146);
3. from the scatter point, gather incident light attenuated by the
   distance the light travels inside the medium (exponential Beer-Lambert
   falloff), scaled by the phase function — isotropic by default, or a
   Lorenz-Mie table (ops/mie.py, the analog of the reference's
   rnd/MieScattering tool) evaluated at the eye/light scattering angle —
   and Fresnel transmittances, incl. the diffuse Fresnel reflectance
   formula the reference quotes (Fdr, sss.c:157-166).

Wavefront form: one scatter sample per lane per call; callers average
multiple keys.  Light distance inside the medium uses the reference's
distant-light simplification (sss.c:96-98: "Assume L is placed at
distant"): depth to the surface along -wi approximated by the scatter
depth times a geometric factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lucille_tpu.accel.dispatch import any_hit
from lucille_tpu.lights.tables import LIGHT_DISTANT, LIGHT_POINT, LIGHT_SUN
from lucille_tpu.shading.reflection import refract


def fresnel_diffuse_reflectance(eta: float) -> float:
    """Fdr = -1.440/eta^2 + 0.710/eta + 0.668 + 0.0636 eta (sss.c:160-166)."""
    return -1.440 / (eta * eta) + 0.710 / eta + 0.668 + 0.0636 * eta


def single_scattering(
    scene,
    lights,
    P,
    N,
    I,
    key,
    sigma_t: float = 2.19,  # reference option defaults (option.c:104-107)
    sigma_s: float = 2.19 - 0.0021,
    eta: float = 1.4,  # sss.c:133
    nsamples: int = 4,
    phase_table=None,
):
    """Single-scattering radiance at surface points P with normals N and
    incident (eye) directions I (pointing toward the surface).

    phase_table: optional (R,) Lorenz-Mie phase table from
    ops/mie.phase_table / milk_phase_table; None keeps the isotropic
    1/(4 pi) phase the reference's sketch assumes.  Returns (B, 3).
    """
    B = P.shape[0]
    albedo_ss = sigma_s / sigma_t

    # 1. refracted eye direction into the medium
    To, _tir = refract(I, N, eta)

    total = jnp.zeros((B, 3), jnp.float32)
    for si in range(nsamples):
        k = jax.random.fold_in(key, si)
        u = jax.random.uniform(k, (B,), minval=1e-6, maxval=1.0)
        s_dist = -jnp.log(u) / sigma_t  # sss.c:146
        s_o = P + s_dist[:, None] * To  # scatter point inside the medium

        for li, light in enumerate(lights):
            if light.type not in (LIGHT_DISTANT, LIGHT_SUN, LIGHT_POINT):
                continue
            col = jnp.asarray(light.color, jnp.float32) * light.intensity
            if light.type == LIGHT_POINT:
                d = jnp.asarray(light.position, jnp.float32) - s_o
                r = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
                wi = d / r[:, None]
                col = col / jnp.maximum(r * r, 1e-6)[:, None]
            else:
                wi = -jnp.asarray(light.direction, jnp.float32)
                wi = jnp.broadcast_to(
                    wi / jnp.maximum(jnp.linalg.norm(wi), 1e-20), P.shape
                )
            # depth light travels inside the medium: project the scatter
            # depth onto the light direction (distant-light simplification)
            cos_i = jnp.maximum(jnp.sum(N * wi, axis=-1), 1e-3)
            si_dist = s_dist * jnp.maximum(
                jnp.sum(-To * N, axis=-1), 1e-3
            ) / cos_i
            # visibility from the ENTRY point on the surface
            entry = s_o + wi * si_dist[:, None]
            vis = 1.0 - any_hit(
                scene, entry + N * scene.eps, wi
            ).astype(jnp.float32)
            # Beer-Lambert along both path segments + phase function at
            # the in-medium scattering angle (refracted eye dir -> wi)
            atten = jnp.exp(-sigma_t * (s_dist + si_dist))
            if phase_table is None:
                phase = 1.0 / (4.0 * jnp.pi)
            else:
                from lucille_tpu.ops.mie import phase_lookup

                cos_sc = jnp.sum(To * wi, axis=-1)
                phase = phase_lookup(phase_table, cos_sc)
            ft = 1.0 - fresnel_diffuse_reflectance(eta)
            contrib = (
                albedo_ss * phase * ft * atten * vis * cos_i
            )[:, None] * col
            total = total + contrib / max(1, lights.nlights)

    return total * (sigma_s / nsamples)
