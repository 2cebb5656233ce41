"""Stackless BVH traversal over ray wavefronts.

TPU-first re-design of the reference's stack-based traversal
(bvh_traverse, bvh.c:1093-1190): instead of a per-ray stack (which would
need per-lane scatter/gather into scratch), every ray carries ONE integer
— its current node in the depth-first order — and follows skip links:

    bbox hit at inner node  -> node + 1        (descend to first child)
    bbox miss               -> skip[node]      (jump over the subtree)
    leaf (after tri tests)  -> skip[node]
    node == n_nodes         -> done

The whole wavefront advances in lock-step inside one `lax.while_loop`;
node data is fetched with vectorized gathers.  Leaf triangle tests are a
statically-unrolled loop of `leaf_size` masked Moller-Trumbore tests
(bvh.c:731-791 semantics).  Early-out for occlusion rays flips the ray
straight to done on first hit.

Traversal-statistics counters (node visits, triangle tests) mirror
ri_statistic_t (render.h:40-47) and are returned per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lucille_tpu.accel.bruteforce import DET_EPS, _tcap

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


# Largest wavefront the traversal loop takes in one piece: beyond ~2^17
# rays the gathered while_loop faults the TPU runtime (reproduced at
# 230400 rays / 32k tris on v5e via axon; 131072 is fine), and chunking
# also bounds the gather temporaries.  Larger wavefronts are processed in
# static slices and re-concatenated.
_MAX_WAVEFRONT = 65536


def _chunked(impl, scene, org, dirn, tmax, tmin):
    B = org.shape[0]
    if B <= _MAX_WAVEFRONT:
        return impl(scene, org, dirn, tmax, tmin)
    outs = []
    for s in range(0, B, _MAX_WAVEFRONT):
        e = min(B, s + _MAX_WAVEFRONT)
        tm = tmax
        if tm is not None and hasattr(tm, "shape") and getattr(tm, "shape", ()):
            tm = tmax[s:e]
        outs.append(impl(scene, org[s:e], dirn[s:e], tm, tmin))
    if isinstance(outs[0], dict):
        res = {}
        for k in outs[0]:
            if outs[0][k].ndim == 0:  # ntrav/ntests counters
                res[k] = sum(o[k] for o in outs)
            else:
                res[k] = jnp.concatenate([o[k] for o in outs])
        return res
    return jnp.concatenate(outs)


def bvh_closest_hit(scene, org, dirn, tmax=None, tmin: float = 0.0):
    """Closest hit via skip-link traversal.  Same contract as
    brute_closest_hit.  Wavefronts beyond _MAX_WAVEFRONT are chunked."""
    if org.shape[0] > _MAX_WAVEFRONT:
        return _chunked(_bvh_closest_hit_impl, scene, org, dirn, tmax, tmin)
    return _bvh_closest_hit_impl(scene, org, dirn, tmax, tmin)


def _bvh_closest_hit_impl(scene, org, dirn, tmax=None, tmin: float = 0.0):
    B = org.shape[0]
    n_nodes = scene.n_nodes
    leaf = scene.leaf_size
    DONE = n_nodes

    inv_dir = 1.0 / jnp.where(jnp.abs(dirn) > 1e-20, dirn, 1e-20)

    # Derive every carry array from the ray data so the while_loop carry
    # keeps the rays' varying-axis type under shard_map (a literal
    # jnp.zeros carry is 'replicated' and trips the vma check; note
    # zeros_like drops the vma too — `x * 0` keeps it).
    z = org[..., 0] * 0.0
    zi = z.astype(jnp.int32)
    t0 = _tcap(B, tmax) + z
    state = dict(
        node=zi,
        t=t0,
        u=z,
        v=z,
        tri=zi - 1,
        ntrav=jnp.sum(zi),
        ntests=jnp.sum(zi),
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
        first = scene.node_first[idx]
        count = scene.node_count[idx]

        box_hit = active & _slab_test(bbmin, bbmax, org, inv_dir, s["t"])
        is_leaf = count > 0
        test_leaf = box_hit & is_leaf

        t_best, u_best, v_best, tri_best = s["t"], s["u"], s["v"], s["tri"]
        ntests = s["ntests"]
        for k in range(leaf):
            m = test_leaf & (k < count)
            tri = jnp.minimum(first + k, scene.tri_v0.shape[0] - 1)
            tv0 = _gather3(scene.tri_v0, tri)
            te1 = _gather3(scene.tri_e1, tri)
            te2 = _gather3(scene.tri_e2, tri)
            t, u, v, hit = _mt_single(org, dirn, tv0, te1, te2)
            better = m & hit & (t > tmin) & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)
            tri_best = jnp.where(better, tri, tri_best)
            ntests = ntests + jnp.sum(m.astype(jnp.int32))

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, idx + 1, skip)
        node = jnp.where(active, nxt, DONE)

        return dict(
            node=node,
            t=t_best,
            u=u_best,
            v=v_best,
            tri=tri_best,
            ntrav=s["ntrav"] + jnp.sum(active.astype(jnp.int32)),
            ntests=ntests,
        )

    s = jax.lax.while_loop(cond, body, state)
    return {
        "t": s["t"],
        "u": s["u"],
        "v": s["v"],
        "tri": s["tri"],
        "hit": s["tri"] >= 0,
        "ntests": s["ntests"],
        "ntrav": s["ntrav"],
    }


def bvh_any_hit(scene, org, dirn, tmax=None, tmin: float = 0.0):
    """Occlusion query with first-hit early out.  Chunked like closest."""
    if org.shape[0] > _MAX_WAVEFRONT:
        return _chunked(_bvh_any_hit_impl, scene, org, dirn, tmax, tmin)
    return _bvh_any_hit_impl(scene, org, dirn, tmax, tmin)


def _bvh_any_hit_impl(scene, org, dirn, tmax=None, tmin: float = 0.0):
    B = org.shape[0]
    n_nodes = scene.n_nodes
    leaf = scene.leaf_size
    DONE = n_nodes

    inv_dir = 1.0 / jnp.where(jnp.abs(dirn) > 1e-20, dirn, 1e-20)
    z = org[..., 0] * 0.0
    tcap = _tcap(B, tmax) + z

    state = dict(
        node=z.astype(jnp.int32),
        occluded=z > 1.0,
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
        first = scene.node_first[idx]
        count = scene.node_count[idx]

        box_hit = active & _slab_test(bbmin, bbmax, org, inv_dir, tcap)
        is_leaf = count > 0
        test_leaf = box_hit & is_leaf

        occluded = s["occluded"]
        for k in range(leaf):
            m = test_leaf & (k < count)
            tri = jnp.minimum(first + k, scene.tri_v0.shape[0] - 1)
            tv0 = _gather3(scene.tri_v0, tri)
            te1 = _gather3(scene.tri_e1, tri)
            te2 = _gather3(scene.tri_e2, tri)
            t, _, _, hit = _mt_single(org, dirn, tv0, te1, te2)
            occluded = occluded | (m & hit & (t > tmin) & (t < tcap))

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, idx + 1, skip)
        # early out: occluded rays are done
        node = jnp.where(active & ~occluded, nxt, DONE)
        return dict(node=node, occluded=occluded)

    s = jax.lax.while_loop(cond, body, state)
    return s["occluded"]


def bvh_diag(scene, org, dirn):
    """Per-ray traversal diagnostics (ri_bvh_diag_t, bvh.h:95-104): node
    visits, leaf visits and triangle tests per query, feeding the BVH
    visualizer (tools_tpu/bvh_viz.py — the testbed BVHVisualizer.cpp
    counterpart).  Returns the closest-hit dict plus per-ray counters
    'nvisits', 'nleafs', 'ntris' (B,) i32."""
    B = org.shape[0]
    n_nodes = scene.n_nodes
    leaf = scene.leaf_size
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
        first = scene.node_first[idx]
        count = scene.node_count[idx]
        box_hit = active & _slab_test(bbmin, bbmax, org, inv_dir, s["t"])
        is_leaf = count > 0
        test_leaf = box_hit & is_leaf

        t_best, tri_best = s["t"], s["tri"]
        ntris = s["ntris"]
        for k in range(leaf):
            m = test_leaf & (k < count)
            tri = jnp.minimum(first + k, scene.tri_v0.shape[0] - 1)
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
