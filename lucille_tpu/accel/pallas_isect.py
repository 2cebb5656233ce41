"""Pallas TPU kernel: fused dense ray-triangle intersection.

A hand-scheduled alternative to the XLA paths (accel/bruteforce.py,
accel/mxu.py) for the dense intersector: one kernel keeps the whole
triangle SoA resident in VMEM and streams ray blocks through it, fusing
the Moller-Trumbore chain, window tests and the argmin reduction — no
HBM round-trips for intermediates (the measured bottleneck of the
unfused VPU path).

Layout (learned the hard way in the AO megakernel, pallas_ao.py): rays
live in LANES, triangles in SUBLANES.  Tiles are (TC, RAY_BLOCK), so the
(1, RB) ray-component rows broadcast across sublanes with no cross-lane
relayout; the per-triangle columns are transposed once per tile (9 tiny
(1, TC) -> (TC, 1) relayouts), and the argmin epilogue reduces over the
sublane axis into (1, RB) rows that store straight to the outputs.

Memory plan (per the TPU model: HBM -> VMEM -> compute):
- triangles: (16, N) f32 in VMEM, rows = [v0|e1|e2|pad] xyz components;
  N padded to a multiple of TC=128 (a 512 pad cost the 322-triangle
  bundled scene 1.6x);
- rays: grid over blocks of RAY_BLOCK rays, each block a (8, RAY_BLOCK)
  VMEM tile, rows = [ox oy oz dx dy dz tmax pad];
- compute: (TC, RAY_BLOCK) broadcasts per triangle tile inside a
  fori_loop — all VPU-elementwise, 8x128-aligned;
- outputs: t/u/v (1, B) f32 + tri (1, B) i32 rows.

Used opportunistically: `pallas_closest_hit` matches the dispatch
contract; tests run it in interpreter mode on CPU, the TPU build is
gated behind scene sizes that fit VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lucille_tpu.accel.bruteforce import DET_EPS

RAY_BLOCK = 256  # rays per grid step
TC = 128  # triangles per inner tile (sublane dimension)

# active-mask compaction pays only when skipped blocks carry real tile
# work; below this tile count the partition + scatter wrapper dominates
COMPACT_MIN_TILES = 8


def _load_tile_cols(tris_ref, base, rows):
    """Row slices of the (16, N) triangle matrix -> (TC, 1) columns."""
    import jax.experimental.pallas as pl

    return [tris_ref[r, pl.ds(base, TC)][:, None] for r in rows]


def _isect_kernel(
    nact_ref,
    rays_ref,
    boxes_ref,
    tris_ref,
    t_ref,
    u_ref,
    v_ref,
    tri_ref,
    ntile_ref,
    t_s,
    u_s,
    v_s,
    tri_s,
    *,
    n_tri_tiles,
):
    """One ray block against every triangle tile; rays stay in lanes.

    Tiles carry AABBs (boxes_ref, SMEM): a tile whose box no ray in the
    block can reach — the slab test also uses the block's current best t
    — is skipped whole via pl.when.  With triangles in spatial (Morton)
    order this is the wavefront analog of the reference's beam tracing
    (bvh.c:545-668): one coherent bundle amortizes one culling test.

    nact_ref (SMEM (1,)): live-lane count.  Wavefronts compacted by an
    active mask (bounce/shadow wavefronts, transport integrators) put
    every live lane below nact; blocks entirely past it skip ALL tile
    work and report misses — wavefront compaction for the dense path."""
    import jax.experimental.pallas as pl

    ox = rays_ref[0:1, :]  # (1, RB)
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    # bounded inverse avoids inf*0 NaNs in the slab test (traverse.py)
    invx = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    invy = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    invz = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)

    t_s[:, :] = jnp.full(t_s.shape, jnp.inf, jnp.float32)
    u_s[:, :] = jnp.zeros(u_s.shape, jnp.float32)
    v_s[:, :] = jnp.zeros(v_s.shape, jnp.float32)
    tri_s[:, :] = jnp.full(tri_s.shape, -1, jnp.int32)

    def body(i, ntested):
        base = i * TC
        # block-vs-tile-AABB slab test (1, RB)
        t0x = (boxes_ref[0, i] - ox) * invx
        t1x = (boxes_ref[3, i] - ox) * invx
        t0y = (boxes_ref[1, i] - oy) * invy
        t1y = (boxes_ref[4, i] - oy) * invy
        t0z = (boxes_ref[2, i] - oz) * invz
        t1z = (boxes_ref[5, i] - oz) * invz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        reach = (tn <= tf) & (tf > 0.0) & (tn < t_s[0:1, :])
        live = jnp.any(reach)

        @pl.when(live)
        def _tile():
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = _load_tile_cols(
                tris_ref, base, range(9)
            )
            t_best = t_s[0:1, :]

            # p = d x e2 : (TC, RB) per component
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            a = e1x * px + e1y * py + e1z * pz
            valid = jnp.abs(a) > DET_EPS
            inva = jnp.where(valid, 1.0 / jnp.where(valid, a, 1.0), 0.0)

            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x

            u = (sx * px + sy * py + sz * pz) * inva
            v = (qx * dx + qy * dy + qz * dz) * inva
            t = (e2x * qx + e2y * qy + e2z * qz) * inva

            hit = (
                valid
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 0.0)
                & (t < t_best)
            )
            t_m = jnp.where(hit, t, jnp.inf)
            # gather-free argmin selection (Mosaic has no take_along_axis):
            # min-reduce t over the triangle (sublane) axis, recover the
            # row by min-reducing masked iota, select u/v by masked sum.
            tc = jnp.min(t_m, axis=0, keepdims=True)  # (1, RB)
            row = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
            is_min = t_m <= tc
            j = jnp.min(
                jnp.where(is_min, row, t_m.shape[0]), axis=0, keepdims=True
            )
            sel = row == j
            u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            better = tc < t_best
            t_s[:, :] = jnp.where(better, tc, t_best)
            u_s[:, :] = jnp.where(better, u_sel, u_s[0:1, :])
            v_s[:, :] = jnp.where(better, v_sel, v_s[0:1, :])
            tri_s[:, :] = jnp.where(better, base + j, tri_s[0:1, :])

        return ntested + live.astype(jnp.int32)

    block_live = pl.program_id(0) * rays_ref.shape[1] < nact_ref[0]
    ntested = jax.lax.cond(
        block_live,
        lambda: jax.lax.fori_loop(0, n_tri_tiles, body, jnp.int32(0)),
        lambda: jnp.int32(0),
    )
    t_ref[:, :] = t_s[:, :]
    u_ref[:, :] = u_s[:, :]
    v_ref[:, :] = v_s[:, :]
    tri_ref[:, :] = tri_s[:, :]
    # Mosaic requires lane-aligned output blocks: broadcast the scalar
    # across the row; the wrapper reads one lane per block
    ntile_ref[:, :] = jnp.full(ntile_ref.shape, ntested, jnp.int32)


# imported late so module import works without pallas (e.g. docs builds)
from jax.experimental import pallas as pl  # noqa: E402

try:  # pltpu is TPU-only; interpret mode works without it
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _pack(scene):
    """Scene SoA -> (16, Npad) f32 triangle matrix + (npad)"""
    n = scene.tri_v0.shape[0]
    npad = -(-n // TC) * TC
    tris = jnp.zeros((16, npad), jnp.float32)
    tris = tris.at[0:3, :n].set(scene.tri_v0.T)
    tris = tris.at[3:6, :n].set(scene.tri_e1.T)
    tris = tris.at[6:9, :n].set(scene.tri_e2.T)
    return tris, npad


SUPER = 16  # tiles per supertile (2048 triangles) for hierarchical culling


def _pack_super_boxes(boxes, n_tiles):
    """Tile boxes (8, n_tiles) -> supertile boxes (8, n_super): the
    second level of the cull hierarchy (groups of SUPER consecutive
    Morton-ordered tiles)."""
    n_super = -(-n_tiles // SUPER)
    pad = n_super * SUPER - n_tiles
    bmin = boxes[0:3]
    bmax = boxes[3:6]
    if pad:
        bmin = jnp.concatenate([bmin, jnp.full((3, pad), jnp.inf)], axis=1)
        bmax = jnp.concatenate([bmax, jnp.full((3, pad), -jnp.inf)], axis=1)
    smin = bmin.reshape(3, n_super, SUPER).min(axis=2)
    smax = bmax.reshape(3, n_super, SUPER).max(axis=2)
    out = jnp.zeros((8, n_super), jnp.float32)
    out = out.at[0:3].set(smin)
    out = out.at[3:6].set(smax)
    return out, n_super


def _pack_boxes(scene, npad, tc: int = TC):
    """Per-tile AABBs -> (8, n_tiles) f32, rows [min xyz | max xyz | pad].

    tc: triangles per tile (the occlusion megakernel passes its own,
    possibly finer, tile height — see pallas_ao._tc_occ).
    Pad triangles (beyond scene.n_tris) contribute +inf/-inf, so an
    all-pad tile has an inverted box and the slab test culls it."""
    nreal = scene.n_tris
    npad_scene = scene.tri_v0.shape[0]
    v0 = scene.tri_v0
    v1 = v0 + scene.tri_e1
    v2 = v0 + scene.tri_e2
    mins = jnp.minimum(jnp.minimum(v0, v1), v2)
    maxs = jnp.maximum(jnp.maximum(v0, v1), v2)
    real = (jnp.arange(npad_scene) < nreal)[:, None]
    mins = jnp.where(real, mins, jnp.inf)
    maxs = jnp.where(real, maxs, -jnp.inf)
    if npad > npad_scene:
        pad = npad - npad_scene
        mins = jnp.concatenate([mins, jnp.full((pad, 3), jnp.inf)])
        maxs = jnp.concatenate([maxs, jnp.full((pad, 3), -jnp.inf)])
    n_tiles = npad // tc
    tmin = mins.reshape(n_tiles, tc, 3).min(axis=1)  # (n_tiles, 3)
    tmax = maxs.reshape(n_tiles, tc, 3).max(axis=1)
    boxes = jnp.zeros((8, n_tiles), jnp.float32)
    boxes = boxes.at[0:3].set(tmin.T)
    boxes = boxes.at[3:6].set(tmax.T)
    return boxes


def pallas_closest_hit(scene, org, dirn, interpret: bool | None = None,
                       active=None):
    """active: optional (B,) bool live mask.  Live lanes are compacted to
    the front (stable partition) so whole dead RAY_BLOCKs are skipped in
    the kernel — wavefront compaction for bounce wavefronts where most
    lanes have terminated (whitted/pathtrace bounces, shadow batches)."""
    if interpret is None:
        # compiled Mosaic needs a real TPU; interpret elsewhere (tests)
        interpret = jax.default_backend() == "cpu"
    npad = -(-scene.tri_v0.shape[0] // TC) * TC
    if npad // TC < COMPACT_MIN_TILES:
        active = None  # tiny scene: the partition/scatter wrapper costs
        # more than the skipped tile work (bench.py r4: pathtrace 26 ->
        # 2.7 Mrays/s when compacting 322-triangle bounces)
    return _pallas_closest_hit(scene, org, dirn, interpret, active,
                               active is not None)


@partial(jax.jit, static_argnames=("interpret", "compact"))
def _pallas_closest_hit(scene, org, dirn, interpret: bool = False,
                        active=None, compact: bool = False):
    """Closest hit via the fused Pallas kernel.  B must be a multiple of
    RAY_BLOCK (the renderer's wavefronts are); returns the dispatch dict."""
    B = org.shape[0]
    assert B % RAY_BLOCK == 0, f"B={B} not a multiple of {RAY_BLOCK}"
    tris, npad = _pack(scene)
    boxes = _pack_boxes(scene, npad)
    n_tri_tiles = npad // TC

    if compact:
        from lucille_tpu.accel.pallas_ao import partition_order

        order, nact = partition_order(active)
        org = org[order]
        dirn = dirn[order]
    else:
        nact = jnp.int32(B)
    nact = nact.astype(jnp.int32).reshape((1,))

    rays = jnp.zeros((8, B), jnp.float32)
    rays = rays.at[0:3].set(org.T)
    rays = rays.at[3:6].set(dirn.T)

    grid = (B // RAY_BLOCK,)
    n_blocks = B // RAY_BLOCK
    kernel = partial(_isect_kernel, n_tri_tiles=n_tri_tiles)
    out_shape = [
        jax.ShapeDtypeStruct((1, B), jnp.float32),  # t
        jax.ShapeDtypeStruct((1, B), jnp.float32),  # u
        jax.ShapeDtypeStruct((1, B), jnp.float32),  # v
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # tri
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # tiles tested (per block)
    ]
    ray_spec = pl.BlockSpec(
        (8, RAY_BLOCK), lambda i: (0, i), memory_space=_VMEM
    ) if _VMEM else pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i))
    box_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if pltpu
        else pl.BlockSpec((8, n_tri_tiles), lambda i: (0, 0))
    )
    tri_shape = (16, npad)
    tri_spec = (
        pl.BlockSpec(tri_shape, lambda i: (0, 0), memory_space=_VMEM)
        if _VMEM
        else pl.BlockSpec(tri_shape, lambda i: (0, 0))
    )
    out_spec = (
        pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=_VMEM)
        if _VMEM
        else pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i))
    )
    nt_spec = out_spec  # same (1, RAY_BLOCK) row blocks as t/u/v/tri
    scratch = [
        pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
        pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
        pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
        pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
    ]

    smem_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if pltpu
        else pl.BlockSpec((1,), lambda i: (0,))
    )
    t, u, v, tri, ntile = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_spec, ray_spec, box_spec, tri_spec],
        out_specs=[out_spec] * 4 + [nt_spec],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(nact, rays, boxes, tris)

    t = t[0]
    u = u[0]
    v = v[0]
    tri = tri[0]
    if compact:
        # scatter back to caller order; skipped lanes report a miss
        unsort = lambda a: jnp.zeros_like(a).at[order].set(a)
        t = unsort(t)
        u = unsort(u)
        v = unsort(v)
        tri = jnp.full_like(tri, -1).at[order].set(tri)
    return {
        "t": t,
        "u": u,
        "v": v,
        "tri": jnp.minimum(tri, scene.tri_v0.shape[0] - 1),
        "hit": tri >= 0,
        # actual tests: surviving tiles x TC triangles x block rays
        # (one lane per block carries the block's tile count)
        "ntests": jnp.sum(ntile[0, ::RAY_BLOCK].astype(jnp.float32))
        * (TC * RAY_BLOCK),
        "ntrav": jnp.sum(ntile[0, ::RAY_BLOCK].astype(jnp.float32)),
    }


def _anyhit_kernel(nact_ref, rays_ref, boxes_ref, tris_ref, occ_ref, occ_s,
                   *, n_tri_tiles):
    """Occlusion-only variant: fused MT + window tests + any-reduce,
    same lane-major layout and tile-AABB culling as the closest-hit
    kernel; a ray already occluded also drops out of the slab test.
    Blocks past nact (compacted-away lanes) skip all tile work."""
    import jax.experimental.pallas as pl

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmax = rays_ref[6:7, :]  # per-ray t ceiling in row 6
    invx = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    invy = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    invz = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)

    occ_s[:, :] = jnp.zeros(occ_s.shape, jnp.float32)

    def body(i, _):
        base = i * TC
        t0x = (boxes_ref[0, i] - ox) * invx
        t1x = (boxes_ref[3, i] - ox) * invx
        t0y = (boxes_ref[1, i] - oy) * invy
        t1y = (boxes_ref[4, i] - oy) * invy
        t0z = (boxes_ref[2, i] - oz) * invz
        t1z = (boxes_ref[5, i] - oz) * invz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        reach = (
            (tn <= tf) & (tf > 0.0) & (tn < tmax) & (occ_s[0:1, :] < 0.5)
        )

        @pl.when(jnp.any(reach))
        def _tile():
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = _load_tile_cols(
                tris_ref, base, range(9)
            )
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            a = e1x * px + e1y * py + e1z * pz
            valid = jnp.abs(a) > DET_EPS
            inva = jnp.where(valid, 1.0 / jnp.where(valid, a, 1.0), 0.0)
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            u = (sx * px + sy * py + sz * pz) * inva
            v = (qx * dx + qy * dy + qz * dz) * inva
            t = (e2x * qx + e2y * qy + e2z * qz) * inva
            hit = (
                valid
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > 0.0)
                & (t < tmax)
            )
            any1 = jnp.any(hit, axis=0, keepdims=True)
            occ_s[:, :] = jnp.maximum(occ_s[0:1, :], any1.astype(jnp.float32))

        return 0

    @pl.when(pl.program_id(0) * rays_ref.shape[1] < nact_ref[0])
    def _live_block():
        jax.lax.fori_loop(0, n_tri_tiles, body, 0)

    occ_ref[:, :] = occ_s[:, :]


def pallas_any_hit(scene, org, dirn, tmax=None, interpret: bool | None = None,
                   active=None):
    """active: optional (B,) bool live mask — see pallas_closest_hit."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    npad = -(-scene.tri_v0.shape[0] // TC) * TC
    if npad // TC < COMPACT_MIN_TILES:
        active = None  # see pallas_closest_hit
    return _pallas_any_hit(scene, org, dirn, tmax, interpret, active,
                           active is not None)


@partial(jax.jit, static_argnames=("interpret", "compact"))
def _pallas_any_hit(scene, org, dirn, tmax=None, interpret: bool = False,
                    active=None, compact: bool = False):
    """Occlusion query via the fused Pallas kernel; returns bool (B,)."""
    B = org.shape[0]
    assert B % RAY_BLOCK == 0
    tris, npad = _pack(scene)
    boxes = _pack_boxes(scene, npad)
    n_tri_tiles = npad // TC
    tmax_row = (
        jnp.full((B,), jnp.inf, jnp.float32)
        if tmax is None
        else jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (B,))
    )
    if compact:
        from lucille_tpu.accel.pallas_ao import partition_order

        order, nact = partition_order(active)
        org = org[order]
        dirn = dirn[order]
        tmax_row = tmax_row[order]
    else:
        nact = jnp.int32(B)
    nact = nact.astype(jnp.int32).reshape((1,))
    rays = jnp.zeros((8, B), jnp.float32)
    rays = rays.at[0:3].set(org.T)
    rays = rays.at[3:6].set(dirn.T)
    rays = rays.at[6].set(tmax_row)

    grid = (B // RAY_BLOCK,)
    kernel = partial(_anyhit_kernel, n_tri_tiles=n_tri_tiles)
    ray_spec = (
        pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i), memory_space=_VMEM)
        if _VMEM
        else pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i))
    )
    box_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if pltpu
        else pl.BlockSpec((8, n_tri_tiles), lambda i: (0, 0))
    )
    tri_spec = (
        pl.BlockSpec((16, npad), lambda i: (0, 0), memory_space=_VMEM)
        if _VMEM
        else pl.BlockSpec((16, npad), lambda i: (0, 0))
    )
    out_spec = (
        pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=_VMEM)
        if _VMEM
        else pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i))
    )
    smem_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if pltpu
        else pl.BlockSpec((1,), lambda i: (0,))
    )
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_spec, ray_spec, box_spec, tri_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.float32)],
        interpret=interpret,
    )(nact, rays, boxes, tris)
    occ = occ[0]
    if compact:
        occ = jnp.zeros_like(occ).at[order].set(occ)
    return occ > 0.5
