"""Shared wavefront helpers for integrators."""

from __future__ import annotations

import jax.numpy as jnp


def interp_hit(scene, res, org, dirn):
    """Gather interpolated shading data at hit points.

    Returns dict(P, Ns (faceted toward the ray), Ng, st (B, 2), cs (B, 3),
    geom (B,), kd, ks (B,), mat_color (B, 3), emission (B, 3)).
    Mirrors ri_intersection_state_build (intersection_state.c:100-240).

    All per-triangle attributes ride ONE (B, 25) gather and all
    per-geometry material fields ONE (B, 12) gather: twelve separate
    (B,)-indexed gathers were ~10 ms of a 47 ms whitted tile (slope,
    r5), while widening a single gather's row is nearly free.
    """
    tri = jnp.maximum(res["tri"], 0)
    u = res["u"][..., None]
    v = res["v"][..., None]
    w = 1.0 - u - v

    t = jnp.where(res["hit"], res["t"], 0.0)
    P = org + t[..., None] * dirn

    # one packed per-triangle attribute row: the (T, .) tables are tiny,
    # so the concat is free and the gather's row width is amortized
    tattr = jnp.concatenate(
        [
            scene.n0, scene.n1, scene.n2,            # 0:9
            scene.st0, scene.st1, scene.st2,         # 9:15
            scene.c0, scene.c1, scene.c2,            # 15:24
            scene.geom_id[:, None].astype(jnp.float32),  # 24
        ],
        axis=1,
    )
    rows = tattr[tri]  # (B, 25)

    n = w * rows[:, 0:3] + u * rows[:, 3:6] + v * rows[:, 6:9]
    Ns = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    ng = jnp.cross(scene.tri_e1[tri], scene.tri_e2[tri])
    Ng = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)

    st = w * rows[:, 9:11] + u * rows[:, 11:13] + v * rows[:, 13:15]
    cs = w * rows[:, 15:18] + u * rows[:, 18:21] + v * rows[:, 21:24]

    geom = rows[:, 24].astype(jnp.int32)
    mattr = jnp.concatenate(
        [
            scene.mat_kd[:, None], scene.mat_ks[:, None],
            scene.mat_kt[:, None], scene.mat_ior[:, None],
            scene.mat_roughness[:, None],             # 0:5
            scene.mat_color, scene.mat_emission,      # 5:11
        ],
        axis=1,
    )
    mrows = mattr[geom]  # (B, 11)
    return {
        "P": P,
        "Ns": Ns,
        "Ng": Ng,
        "st": st,
        "cs": cs,
        "geom": geom,
        "kd": mrows[:, 0],
        "ks": mrows[:, 1],
        "kt": mrows[:, 2],
        "ior": mrows[:, 3],
        "roughness": mrows[:, 4],
        "mat_color": mrows[:, 5:8],
        "emission": mrows[:, 8:11],
    }


def apply_texture(scene, textures, h, albedo):
    """Modulate an albedo by the material texture at the hit st, when the
    geometry's material binds one (texture.c ri_texture_fetch path)."""
    import jax.numpy as jnp

    if textures is None or getattr(textures, "data", None) is None:
        return albedo
    tex_id = scene.mat_texture[h["geom"]]
    texcol = textures.fetch(
        jnp.maximum(tex_id, 0), h["st"][..., 0], h["st"][..., 1]
    )
    return albedo * jnp.where((tex_id >= 0)[..., None], texcol, 1.0)


def face_forward(N, dirn):
    """Flip N to the hemisphere opposing the incoming ray direction."""
    s = jnp.where(jnp.sum(N * dirn, axis=-1, keepdims=True) > 0.0, -1.0, 1.0)
    return N * s


def background_radiance(lights, dirn, bgcolor=(0.0, 0.0, 0.0)):
    """Environment contribution for escaped rays: sunsky/IBL/dome lookup,
    else the option bgcolor (reference: AO returns black on miss;
    pathtrace gathers IBL)."""
    out = jnp.broadcast_to(
        jnp.asarray(bgcolor, jnp.float32), dirn.shape
    ).astype(jnp.float32)
    if lights is None:
        return out
    for light in lights:
        if light.type == "sunsky" and light.sunsky is not None:
            d_sky = jnp.stack([dirn[:, 0], dirn[:, 2], dirn[:, 1]], axis=-1)
            out = out + light.sunsky.sky_rgb(d_sky)
        elif light.type in ("dome", "ibl"):
            col = jnp.asarray(light.color, jnp.float32) * light.intensity
            if getattr(light, "env", None) is not None:
                # escaped rays see the actual environment texture
                # (pathtrace.c IBL gather; texture.c:238)
                out = out + light.env.fetch(dirn) * col[None, :]
            else:
                out = out + jnp.broadcast_to(col, dirn.shape)
    return out
