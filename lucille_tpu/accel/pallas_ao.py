"""Pallas TPU megakernel: fused ambient-occlusion gather.

The AO integrator's hot phase traces ``ntheta*nphi`` stratified
hemisphere rays per primary hit (ambientocclusion.c:43-150).  The
wavefront formulation runs that as a `lax.scan` of occlusion queries —
one Pallas launch per stratum, each re-streaming the triangle SoA from
HBM and bouncing the (8, B) ray buffers through HBM between steps.

This kernel fuses the WHOLE gather loop:

- triangles stay VMEM-resident across *all* strata (one HBM read per
  ray block instead of ``nsamples``);
- hemisphere directions are generated inside the kernel from the
  shading basis + a streamed jitter block (the stratified
  ``cos_theta = sqrt((i+u)/n)`` sampling of ambientocclusion.c:85-110),
  so no per-stratum ray buffers ever exist in HBM;
- the Moller-Trumbore terms that depend only on (ray origin, triangle)
  — ``s = o - v0``, ``q = s x e1``, ``e2.q`` — are hoisted out of the
  strata loop (the origin is fixed per primary hit), cutting ~40% of
  the inner-loop FLOPs vs. a full per-stratum MT evaluation;
- per-stratum occlusion flags accumulate in a VMEM scratch and reduce
  to a single occlusion count per ray at the end.

Memory plan per grid step (RAY_BLOCK rays):
- rays: (16, RB) f32 — rows [P_off | b0 | b1 | b2 | hit | pad*3];
- jitter: (2*nsamples, RB) f32 — two U[0,1) per stratum (host-side
  threefry; Mosaic has no interpret-mode PRNG, and streaming 8 B/ray
  /stratum is ~0.1% of kernel time);
- tris: (16, Npad) f32 VMEM-resident, rows [v0|e1|e2|pad] xyz;
- scratch: 4x (nsamples, RB) f32 for directions + per-stratum flags.

Interpret mode runs the identical kernel on CPU for the test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = pltpu.VMEM

from lucille_tpu.accel.bruteforce import DET_EPS
from lucille_tpu.accel.pallas_isect import RAY_BLOCK, TC, _pack

# VMEM budget gate: triangle matrix bytes that still leave room for the
# (RAY_BLOCK, TC) intermediate tiles (~9 MB) inside ~16 MB of VMEM.
MAX_TRIS_FOR_MEGAKERNEL = 49152


def _ao_kernel(
    rays_ref,
    jit_ref,
    tris_ref,
    occ_ref,
    wx_ref,
    wy_ref,
    wz_ref,
    flag_ref,
    *,
    n_tri_tiles,
    ntheta,
    nphi,
):
    nsamples = ntheta * nphi

    b0x = rays_ref[3:4, :]
    b0y = rays_ref[4:5, :]
    b0z = rays_ref[5:6, :]
    b1x = rays_ref[6:7, :]
    b1y = rays_ref[7:8, :]
    b1z = rays_ref[8:9, :]
    b2x = rays_ref[9:10, :]
    b2y = rays_ref[10:11, :]
    b2z = rays_ref[11:12, :]

    # ---- phase 1: stratified hemisphere directions into VMEM scratch
    # (ambientocclusion.c:85-110; basis rotation reflection.c:332-340)
    def gen(s, _):
        u0 = jit_ref[pl.ds(2 * s, 1), :]  # (1, RB)
        u1 = jit_ref[pl.ds(2 * s + 1, 1), :]
        fi = (s % ntheta).astype(jnp.float32)
        fj = (s // ntheta).astype(jnp.float32)
        z0 = (fi + u0) * (1.0 / ntheta)
        z1 = (fj + u1) * (1.0 / nphi)
        cos_t = jnp.sqrt(z0)
        phi = (2.0 * jnp.pi) * z1
        lx = jnp.cos(phi) * cos_t
        ly = jnp.sin(phi) * cos_t
        lz = jnp.sqrt(jnp.maximum(1.0 - z0, 0.0))
        wx_ref[pl.ds(s, 1), :] = lx * b0x + ly * b1x + lz * b2x
        wy_ref[pl.ds(s, 1), :] = lx * b0y + ly * b1y + lz * b2y
        wz_ref[pl.ds(s, 1), :] = lx * b0z + ly * b1z + lz * b2z
        flag_ref[pl.ds(s, 1), :] = jnp.zeros((1, rays_ref.shape[1]), jnp.float32)
        return 0

    jax.lax.fori_loop(0, nsamples, gen, 0)

    oxT = rays_ref[0:1, :].T  # (RB, 1)
    oyT = rays_ref[1:2, :].T
    ozT = rays_ref[2:3, :].T

    # ---- phase 2: triangle tiles outer (hoist origin-only terms),
    # strata inner (direction-dependent MT remainder)
    def tile_body(ti, _):
        base = ti * TC
        v0x = tris_ref[0, pl.ds(base, TC)][None, :]  # (1, TC)
        v0y = tris_ref[1, pl.ds(base, TC)][None, :]
        v0z = tris_ref[2, pl.ds(base, TC)][None, :]
        e1x = tris_ref[3, pl.ds(base, TC)][None, :]
        e1y = tris_ref[4, pl.ds(base, TC)][None, :]
        e1z = tris_ref[5, pl.ds(base, TC)][None, :]
        e2x = tris_ref[6, pl.ds(base, TC)][None, :]
        e2y = tris_ref[7, pl.ds(base, TC)][None, :]
        e2z = tris_ref[8, pl.ds(base, TC)][None, :]

        # origin-only Moller-Trumbore terms, once per (ray, triangle)
        sx = oxT - v0x  # (RB, TC)
        sy = oyT - v0y
        sz = ozT - v0z
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        e2q = e2x * qx + e2y * qy + e2z * qz

        def strat(s, _):
            dxT = wx_ref[pl.ds(s, 1), :].T  # (RB, 1)
            dyT = wy_ref[pl.ds(s, 1), :].T
            dzT = wz_ref[pl.ds(s, 1), :].T
            px = dyT * e2z - dzT * e2y
            py = dzT * e2x - dxT * e2z
            pz = dxT * e2y - dyT * e2x
            a = e1x * px + e1y * py + e1z * pz
            valid = jnp.abs(a) > DET_EPS
            inva = jnp.where(valid, 1.0 / jnp.where(valid, a, 1.0), 0.0)
            u = (sx * px + sy * py + sz * pz) * inva
            v = (qx * dxT + qy * dyT + qz * dzT) * inva
            t = e2q * inva
            hit = (
                valid
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 0.0)
            )
            any1 = jnp.any(hit, axis=1, keepdims=True)  # (RB, 1)
            prev = flag_ref[pl.ds(s, 1), :]
            flag_ref[pl.ds(s, 1), :] = jnp.maximum(
                prev, any1.astype(jnp.float32).T
            )
            return 0

        jax.lax.fori_loop(0, nsamples, strat, 0)
        return 0

    jax.lax.fori_loop(0, n_tri_tiles, tile_body, 0)

    hit_row = rays_ref[12:13, :]  # primary-hit mask
    occ_ref[:, :] = jnp.sum(flag_ref[:, :], axis=0, keepdims=True) * hit_row


def pallas_ao_occlusion(
    scene,
    P_off,
    b0,
    b1,
    b2,
    hit,
    key,
    ntheta: int,
    nphi: int,
    interpret: bool | None = None,
):
    """Occlusion counts for a wavefront of primary hits.

    P_off: (B, 3) eps-offset shading points; b0/b1/b2: (B, 3) ortho
    basis (b2 = shading normal); hit: (B,) primary-hit mask.  Returns
    (B,) f32 — number of the ``ntheta*nphi`` stratified hemisphere rays
    that are occluded (0 where ``hit`` is False).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _pallas_ao_occlusion(
        scene, P_off, b0, b1, b2, hit, key, ntheta, nphi, interpret
    )


@partial(jax.jit, static_argnames=("ntheta", "nphi", "interpret"))
def _pallas_ao_occlusion(
    scene, P_off, b0, b1, b2, hit, key, ntheta, nphi, interpret
):
    B = P_off.shape[0]
    assert B % RAY_BLOCK == 0, f"B={B} not a multiple of {RAY_BLOCK}"
    nsamples = ntheta * nphi
    tris, npad = _pack(scene)
    n_tri_tiles = npad // TC

    rays = jnp.zeros((16, B), jnp.float32)
    rays = rays.at[0:3].set(P_off.T)
    rays = rays.at[3:6].set(b0.T)
    rays = rays.at[6:9].set(b1.T)
    rays = rays.at[9:12].set(b2.T)
    rays = rays.at[12].set(hit.astype(jnp.float32))

    jitter = jax.random.uniform(key, (2 * nsamples, B), dtype=jnp.float32)

    def spec(shape, index_map):
        if _VMEM:
            return pl.BlockSpec(shape, index_map, memory_space=_VMEM)
        return pl.BlockSpec(shape, index_map)

    grid = (B // RAY_BLOCK,)
    kernel = partial(
        _ao_kernel, n_tri_tiles=n_tri_tiles, ntheta=ntheta, nphi=nphi
    )
    scratch_shapes = [pltpu.VMEM((nsamples, RAY_BLOCK), jnp.float32)] * 4

    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((16, RAY_BLOCK), lambda i: (0, i)),
            spec((2 * nsamples, RAY_BLOCK), lambda i: (0, i)),
            spec((16, npad), lambda i: (0, 0)),
        ],
        out_specs=spec((1, RAY_BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(rays, jitter, tris)
    return occ[0]
