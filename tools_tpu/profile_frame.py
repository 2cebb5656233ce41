"""Stage-level profiler for AO frames on the tunneled TPU.

Breaks one tile's AO work into stages and times each with a HOST
TRANSFER barrier (jax.block_until_ready does not block on the axon
backend — docs/performance.md "Measurement discipline"), so every number
below is wall-clock-true at ~RTT resolution:

  eye        camera rays + closest hit (accel dispatch)
  shade      hit interp, normals, basis, eps offset
  occl       the AO occlusion gather (megakernel or tile-BVH)
  sub        occlusion-gather sub-stages (compaction sort, direction
             gen, the kernel itself, the scatter) — megakernel path
  finish     radiance assembly + texture modulation + counters

Usage:
  python tools_tpu/profile_frame.py plane_sphere   # 512x512 north star
  python tools_tpu/profile_frame.py bench          # bundled AO scene
  python tools_tpu/profile_frame.py height724      # 1M-tri heightfield
  python tools_tpu/profile_frame.py height256      # 130k heightfield

Prints one JSON line per stage: {"stage": ..., "ms": ..., "per_ray_ns"}.
The hot phases run twice; the second (cached-compile) timing is reported.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _sync(x):
    """True barrier on axon: pull ONE ELEMENT of every leaf to the host.
    The slice computes on device after the producer, so the pull blocks
    until the stage is done without paying a bulk device->host transfer
    (25 MB of rays costs ~600 ms on the tunnel and would swamp the
    stage being measured)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
        else:
            np.asarray(leaf)
    return x


def _time(fn, *args, repeat=2, **kw):
    """Compile+warm on the first call, report the second."""
    out = None
    dt = 0.0
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = _sync(fn(*args, **kw))
        dt = time.perf_counter() - t0
    return out, dt


def build_scene(which: str):
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib_file

    if which == "plane_sphere":
        state = RiState()
        parse_rib_file(
            "/root/reference/examples/plane_sphere/Scene_DEFAULT_Set0.rib",
            state,
        )
        state.Format(512, 512)
        return state, 256
    if which == "bench":
        state = RiState()
        parse_rib_file(
            "/root/reference/examples/ambient_occlusion/ambient_occlusion.rib",
            state,
        )
        state.Format(640, 480)
        return state, 240
    if which.startswith("height"):
        sys.path.insert(0, "/root/repo")
        from bench_large import heightfield_scene

        return heightfield_scene(int(which[6:])), 128
    raise SystemExit(f"unknown scene {which}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "plane_sphere"
    import jax
    import jax.numpy as jnp

    state, tile = build_scene(which)
    from lucille_tpu.render.renderer import Renderer
    from lucille_tpu.sampling.hammersley import subpixel_samples
    from lucille_tpu.transport.ao import _interp_normal, ortho_basis

    r = Renderer(state.scene, tile_size=tile)
    scene = r.scene
    opt = state.scene.options
    disp = opt.current_display()
    xs, ys = int(disp.sampling_rates[0]), int(disp.sampling_rates[1])
    S = xs * ys

    # one tile's worth of eye rays, centered (live-lane-rich)
    jitter_np, _ = subpixel_samples(xs, ys)
    jitter = jnp.asarray(jitter_np, jnp.float32)
    W, H = opt.width, opt.height
    x0 = (W // (2 * tile)) * tile
    y0 = (H // (2 * tile)) * tile
    px = x0 + np.arange(tile, dtype=np.float32)
    py = y0 + np.arange(tile, dtype=np.float32)
    fx = (px[None, :, None] + np.asarray(jitter_np)[:, 0][None, None, :])
    fy = (py[:, None, None] + np.asarray(jitter_np)[:, 1][None, None, :])
    fx = jnp.asarray(np.broadcast_to(fx, (tile, tile, S)).reshape(-1))
    fy = jnp.asarray(np.broadcast_to(fy, (tile, tile, S)).reshape(-1))
    B = fx.shape[0]

    from lucille_tpu.accel.dispatch import closest_hit

    cam = r._frozen_camera
    gen = jax.jit(lambda fx, fy: cam.generate_rays(fx, fy, None))
    (org, dirn), dt = _time(gen, fx, fy)
    print(json.dumps({"stage": "camrays", "ms": dt * 1e3, "B": B}))

    hit_fn = jax.jit(lambda o, d: closest_hit(scene, o, d))
    res, dt = _time(hit_fn, org, dirn)
    print(
        json.dumps(
            {
                "stage": "eye_closest_hit",
                "ms": dt * 1e3,
                "per_ray_ns": dt / B * 1e9,
                "hit_frac": float(np.asarray(res["hit"]).mean()),
            }
        )
    )

    def shade(res, org, dirn):
        hit = res["hit"]
        t = jnp.where(hit, res["t"], 0.0)
        P = org + t[..., None] * dirn
        Ns = _interp_normal(scene, res)
        b0, b1, b2 = ortho_basis(Ns)
        return P + Ns * scene.eps, b0, b1, b2, hit

    shade_fn = jax.jit(shade)
    (P_off, b0, b1, b2, hit), dt = _time(shade_fn, res, org, dirn)
    print(json.dumps({"stage": "shade_prep", "ms": dt * 1e3}))

    key = jax.random.key(7)
    ntheta = max(1, int(np.sqrt(opt.gather_nsamples)))
    nrays_gather = int(np.asarray(hit).sum()) * ntheta * ntheta

    if scene.accel == "pallas":
        from lucille_tpu.accel.pallas_ao import (
            _pack_occ,
            TC_OCC,
            compaction_order,
            pallas_ao_occlusion,
        )

        occ, dt = _time(
            pallas_ao_occlusion, scene, P_off, b0, b1, b2, hit, key,
            ntheta, ntheta,
        )
        print(
            json.dumps(
                {
                    "stage": "occl_megakernel",
                    "ms": dt * 1e3,
                    "per_gather_ray_ns": dt / max(nrays_gather, 1) * 1e9,
                    "tc": TC_OCC,
                }
            )
        )
        # sub-stage: the compaction sort alone
        tris, npad = _pack_occ(scene, TC_OCC)
        sort_fn = jax.jit(
            lambda P, b, h: compaction_order(scene, P, b, h, npad // TC_OCC)
        )
        _, dt = _time(sort_fn, P_off, b2, hit)
        print(json.dumps({"stage": "sub_compaction_sort", "ms": dt * 1e3}))
    elif scene.accel == "pbvh":
        from lucille_tpu.accel.pallas_bvh import pallas_bvh_ao_occlusion

        (occ, gstats), dt = _time(
            pallas_bvh_ao_occlusion, scene, P_off, b0, b1, b2, hit, key,
            ntheta, ntheta,
        )
        gs = np.asarray(gstats)
        print(
            json.dumps(
                {
                    "stage": "occl_tile_bvh",
                    "ms": dt * 1e3,
                    "per_gather_ray_ns": dt / max(nrays_gather, 1) * 1e9,
                    "nvis": float(gs[0]),
                    "ntile": float(gs[1]),
                    "nmiss": float(gs[2]),
                }
            )
        )
        # sub-stages of the cone-tiled path: order + direction gen
        from lucille_tpu.accel.pallas_ao import compaction_order
        from lucille_tpu.accel.pallas_bvh import _stratified_dirs

        sort_fn = jax.jit(
            lambda P, b, h: compaction_order(scene, P, b, h, 1 << 20)
        )
        _, dt = _time(sort_fn, P_off, b2, hit)
        print(json.dumps({"stage": "sub_compaction_sort", "ms": dt * 1e3}))
        dirs_fn = jax.jit(
            lambda b0, b1, b2, k: _stratified_dirs(
                b0, b1, b2, k, ntheta, ntheta
            )
        )
        _, dt = _time(dirs_fn, b0, b1, b2, key)
        print(json.dumps({"stage": "sub_stratified_dirs", "ms": dt * 1e3}))

    # full tile through the production kernel, for the wrapper delta
    kernel = r._get_kernel(tile, tile, xs, ys)
    weights = jnp.full((S,), 1.0 / S, jnp.float32)
    tkey = jax.random.fold_in(jax.random.fold_in(key, x0), y0)
    full_fn = lambda: kernel(
        scene, jnp.int32(x0), jnp.int32(y0), jitter, weights, tkey
    )
    out, dt = _time(full_fn)
    nrays_tile = float(np.asarray(out[1]["counters"])[3])
    print(
        json.dumps(
            {
                "stage": "full_tile_kernel",
                "ms": dt * 1e3,
                "tile_mrays_per_s": nrays_tile / dt / 1e6,
            }
        )
    )


if __name__ == "__main__":
    main()
