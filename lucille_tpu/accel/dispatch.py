"""Accel dispatch: route intersection queries to the bound structure.

Equivalent of the reference's ri_accel_t vtable + ri_raytrace
(accel.h:43-89, raytrace.c:31-69): the scene's `accel` tag (static
metadata, so jit specializes on it) picks the intersector.
"""

from __future__ import annotations

from lucille_tpu.accel import bruteforce, mxu, traverse


def closest_hit(scene, org, dirn, tmax=None, tmin: float = 0.0):
    if scene.accel == "bvh" and scene.n_nodes > 0:
        return traverse.bvh_closest_hit(scene, org, dirn, tmax=tmax, tmin=tmin)
    if scene.accel == "mxu":
        return mxu.mxu_closest_hit(scene, org, dirn, tmax=tmax, tmin=tmin)
    return bruteforce.brute_closest_hit(scene, org, dirn, tmax=tmax, tmin=tmin)


def any_hit(scene, org, dirn, tmax=None, tmin: float = 0.0):
    if scene.accel == "bvh" and scene.n_nodes > 0:
        return traverse.bvh_any_hit(scene, org, dirn, tmax=tmax, tmin=tmin)
    if scene.accel == "mxu":
        return mxu.mxu_any_hit(scene, org, dirn, tmax=tmax, tmin=tmin)
    return bruteforce.brute_any_hit(scene, org, dirn, tmax=tmax, tmin=tmin)
