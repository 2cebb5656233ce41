"""BVH traversal DIAGNOSTICS over ray wavefronts.

Round 1 carried a gathered per-lane production traversal here; it ran at
~8 Krays/s on TPU and faulted the runtime above 2^17-ray wavefronts, so
it was deleted — the production BVH path is the Pallas tile-BVH
(accel/pallas_bvh.py), where all vector work is dense and traversal
control flow is scalar.

What remains is the per-ray instrumentation path: `bvh_diag` mirrors the
reference's opt-in traversal diagnostics (ri_bvh_diag_t, bvh.h:95-104)
and feeds the BVH visualizer (tools_tpu/bvh_viz.py, the counterpart of
the testbed's BVHVisualizer.cpp).  Per-ray exactness matters more than
throughput for a heatmap, so the gathered walk is the right tool here —
it reports node visits / leaf visits / triangle tests for EACH ray, which
the block-level kernel cannot (its counters are per 256-lane block).

Node layout: skip-link DFS arrays over tile-aligned leaves
(accel/pallas_bvh.build_tile_bvh): node_first/node_count are in TILE
units; a leaf's triangles occupy [first*TC, (first+count)*TC) with
degenerate zero-triangle padding that can never hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lucille_tpu.accel.bruteforce import DET_EPS, _tcap
from lucille_tpu.accel.pallas_isect import TC

SLAB_EPS = 1.0e-6


def _gather3(arr, idx):
    return arr[idx]  # (B, 3) gather by node/tri index


def _slab_test(bbmin, bbmax, org, inv_dir, t_best):
    """Ray-AABB slab test (test_ray_aabb, bvh.c:870). Returns bool (B,)."""
    t0 = (bbmin - org) * inv_dir
    t1 = (bbmax - org) * inv_dir
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar + SLAB_EPS) & (tfar > 0.0) & (tnear < t_best)


def _mt_single(org, dirn, v0, e1, e2):
    """Moller-Trumbore for one gathered triangle per ray: all (B, 3)."""
    p = jnp.cross(dirn, e2)
    a = jnp.sum(e1 * p, axis=-1)
    valid = jnp.abs(a) > DET_EPS
    inva = jnp.where(valid, 1.0 / jnp.where(valid, a, 1.0), 0.0)
    s = org - v0
    q = jnp.cross(s, e1)
    u = jnp.sum(s * p, axis=-1) * inva
    v = jnp.sum(q * dirn, axis=-1) * inva
    t = jnp.sum(e2 * q, axis=-1) * inva
    hit = (
        valid
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return t, u, v, hit


def bvh_diag(scene, org, dirn):
    """Per-ray traversal diagnostics (ri_bvh_diag_t, bvh.h:95-104): node
    visits, leaf visits and triangle tests per query, feeding the BVH
    visualizer.  Returns the closest-hit dict plus per-ray counters
    'nvisits', 'nleafs', 'ntris' (B,) i32."""
    B = org.shape[0]
    n_nodes = scene.n_nodes
    DONE = n_nodes

    inv_dir = 1.0 / jnp.where(jnp.abs(dirn) > 1e-20, dirn, 1e-20)
    z = org[..., 0] * 0.0
    zi = z.astype(jnp.int32)
    state = dict(
        node=zi,
        t=_tcap(B, None) + z,
        tri=zi - 1,
        nvisits=zi,
        nleafs=zi,
        ntris=zi,
    )

    def cond(s):
        return jnp.any(s["node"] < DONE)

    def body(s):
        node = s["node"]
        active = node < DONE
        idx = jnp.minimum(node, DONE - 1)
        bbmin = _gather3(scene.node_bbmin, idx)
        bbmax = _gather3(scene.node_bbmax, idx)
        skip = scene.node_skip[idx]
        first = scene.node_first[idx]  # tile units (pallas_bvh layout)
        count = scene.node_count[idx]
        box_hit = active & _slab_test(bbmin, bbmax, org, inv_dir, s["t"])
        is_leaf = count > 0
        test_leaf = box_hit & is_leaf

        ntri_max = jnp.max(jnp.where(test_leaf, count, 0)) * TC

        def leaf_k(k, carry):
            t_best, tri_best, ntris = carry
            m = test_leaf & (k < count * TC)
            tri = jnp.minimum(first * TC + k, scene.tri_v0.shape[0] - 1)
            t, _, _, hit = _mt_single(
                org,
                dirn,
                _gather3(scene.tri_v0, tri),
                _gather3(scene.tri_e1, tri),
                _gather3(scene.tri_e2, tri),
            )
            better = m & hit & (t > 0.0) & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, tri, tri_best)
            ntris = ntris + m.astype(jnp.int32)
            return t_best, tri_best, ntris

        t_best, tri_best, ntris = jax.lax.fori_loop(
            0, ntri_max, leaf_k, (s["t"], s["tri"], s["ntris"])
        )

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, idx + 1, skip)
        return dict(
            node=jnp.where(active, nxt, DONE),
            t=t_best,
            tri=tri_best,
            nvisits=s["nvisits"] + active.astype(jnp.int32),
            nleafs=s["nleafs"] + test_leaf.astype(jnp.int32),
            ntris=ntris,
        )

    s = jax.lax.while_loop(cond, body, state)
    return {
        "t": s["t"],
        "tri": s["tri"],
        "hit": s["tri"] >= 0,
        "nvisits": s["nvisits"],
        "nleafs": s["nleafs"],
        "ntris": s["ntris"],
    }
