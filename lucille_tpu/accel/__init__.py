"""Acceleration structures and intersection kernels.

TPU-native replacement for lucille's accel layer (src/render/accel.c
vtable, src/render/bvh.c SAH-binned BVH, src/render/ugrid.c — SURVEY.md
section 2.4).  Two interchangeable intersectors, mirroring the reference's
``ri_accel_bind(RI_ACCEL_UGRID | RI_ACCEL_BVH)`` (accel.c:70-107):

- ``bruteforce``: dense Moller-Trumbore over every (ray, triangle) pair in
  lane-aligned chunks — pure VPU work with zero divergence; the fastest
  choice for small scenes on TPU and the correctness oracle for the BVH.
  (The reference's grid is a stub — ugrid.c:376-385 — so BVH+bruteforce is
  a strictly more functional pairing.)
- ``pbvh``: host binned-SAH build (bvh.c:1329 semantics) flattened to a
  skip-link (DFS escape-index) layout over 128-triangle tiles; traversal
  is a Pallas kernel — scalar while-loop over nodes in SMEM, dense
  (tile, lane) VPU tests at leaves (accel/pallas_bvh.py).  Per-ray
  gathered traversal survives only as the visualizer's diagnostics path
  (accel/traverse.py).
"""

from lucille_tpu.accel.bvh import BVH, build_bvh
from lucille_tpu.accel.bruteforce import brute_any_hit, brute_closest_hit
from lucille_tpu.accel.dispatch import any_hit, closest_hit

__all__ = [
    "BVH",
    "build_bvh",
    "brute_closest_hit",
    "brute_any_hit",
    "closest_hit",
    "any_hit",
]
