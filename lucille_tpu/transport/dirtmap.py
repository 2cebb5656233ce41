"""Dirtmap integrator: distance-weighted ambient occlusion.

Capability-equivalent of src/transport/dirtmap.c (Rind-style dirtmap AO
variant, dirtmap.c:38-41): like AO, but occlusion is weighted by how
CLOSE the occluder is — nearby geometry contributes more "dirt" — with a
gather distance cap.  Built on the closest-hit wavefront instead of
any-hit so occluder distances are available.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lucille_tpu.accel.dispatch import closest_hit
from lucille_tpu.transport.ao import ortho_basis, _interp_normal


def dirtmap_radiance(
    scene,
    org,
    dirn,
    key,
    ntheta: int,
    nphi: int,
    gather_dist: float | None = None,
):
    """Dirtmap radiance: 1 - mean(max(0, 1 - d/gather_dist)) over the
    hemisphere.  gather_dist defaults to 1/4 of the scene diagonal."""
    B = org.shape[0]
    res = closest_hit(scene, org, dirn)
    hit = res["hit"]
    t = jnp.where(hit, res["t"], 0.0)
    P = org + t[..., None] * dirn
    Ns = _interp_normal(scene, res)
    b0, b1, b2 = ortho_basis(Ns)
    P_off = P + Ns * scene.eps

    if gather_dist is None:
        diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)
        gather_dist = 0.25 * diag

    nsamples = ntheta * nphi
    strata = jnp.arange(nsamples, dtype=jnp.int32)

    def step(dirt, si):
        i = (si % ntheta).astype(jnp.float32)
        j = (si // ntheta).astype(jnp.float32)
        k = jax.random.fold_in(key, si)
        ur = jax.random.uniform(k, (B, 2), dtype=jnp.float32)
        z0 = (i + ur[:, 0]) / ntheta
        z1 = (j + ur[:, 1]) / nphi
        cos_t = jnp.sqrt(z0)
        phi = 2.0 * jnp.pi * z1
        d = (
            (jnp.cos(phi) * cos_t)[..., None] * b0
            + (jnp.sin(phi) * cos_t)[..., None] * b1
            + jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))[..., None] * b2
        )
        r = closest_hit(scene, P_off, d, tmax=gather_dist)
        w = jnp.where(
            r["hit"], jnp.maximum(1.0 - r["t"] / gather_dist, 0.0), 0.0
        )
        return dirt + w, None

    dirt, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), strata)
    lo = jnp.clip(1.0 - dirt / nsamples, 0.0, 1.0)
    radiance = jnp.where(hit, lo, 0.0)[..., None] * jnp.ones((1, 3), jnp.float32)
    return radiance, {
        "hit": hit,
        "nrays": B * (1 + nsamples),
        "ntests": res["ntests"],
        "ntrav": res["ntrav"],
    }
