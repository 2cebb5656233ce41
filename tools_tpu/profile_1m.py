"""Decompose the 1M-triangle AO frame: anyhit kernel vs glue.

Chained-slope timing (docs/performance.md "Measurement discipline"):
run the op once and N times inside one jit; the slope is the true
kernel time, free of the ~40-50 ms dispatch floor.

Usage: python tools_tpu/profile_1m.py [n]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return np.asarray(x.ravel()[:1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 724
    import jax
    import jax.numpy as jnp

    from bench_large import heightfield_scene, WIDTH, HEIGHT, PS
    from lucille_tpu.render.renderer import Renderer
    from lucille_tpu.accel import pallas_bvh as pb

    s = heightfield_scene(n)
    r = Renderer(s.scene, tile_size=128)
    t0 = time.perf_counter()
    r.render_frame()
    print(f"warmup frame: {time.perf_counter() - t0:.2f}s", flush=True)
    r.stats.nrays = 0
    t0 = time.perf_counter()
    r.render_frame()
    dt_frame = time.perf_counter() - t0
    print(f"frame: {dt_frame*1e3:.1f} ms, {r.stats.nrays/dt_frame/1e6:.2f} "
          "Mrays/s", flush=True)

    # ---- reassemble the same cone-tiled wavefront the frame traced ----
    scene = r.scene
    from lucille_tpu.accel.dispatch import closest_hit
    from lucille_tpu.transport.ao import ortho_basis, _interp_normal

    W, H = WIDTH, HEIGHT
    xs = (jnp.arange(W * PS) + 0.5) / PS
    ys = (jnp.arange(H * PS) + 0.5) / PS
    xx, yy = jnp.meshgrid(xs, ys)
    org, dirn = r.camera.generate_rays(xx.ravel(), yy.ravel())
    res = closest_hit(scene, org, dirn)
    hit = res["hit"]
    t = jnp.where(hit, res["t"], 0.0)
    P = org + t[..., None] * dirn
    Ns = _interp_normal(scene, res)
    b0, b1, b2 = ortho_basis(Ns)
    P_off = P + Ns * scene.eps
    key = jax.random.PRNGKey(7)
    oo, dd, order, live, layout = pb._conetile_rays(
        scene, P_off, b0, b1, b2, hit, key, 8, 8, pb._cone_k()
    )
    NG, ST, K, G, S, Bpad, B = layout
    print(f"wavefront: B={B} hits={int(hit.sum())} lanes={S*Bpad} "
          f"blocks={S*Bpad//256}", flush=True)

    hbm = pb._use_hbm(pb._scene_npad(scene))

    # ---- chained-slope: anyhit kernel 1x vs 3x --------------------------
    @jax.jit
    def k1(oo, dd):
        occ, stats = pb._pallas_bvh_any_hit(scene, oo, dd, None, False, hbm)
        return occ.sum(), stats

    @jax.jit
    def k3(oo, dd):
        tot = jnp.float32(0)
        st = jnp.zeros((3,), jnp.float32)
        for i in range(3):
            occ, stats = pb._pallas_bvh_any_hit(
                scene, oo, dd + 0.0 * tot, None, False, hbm)
            tot = tot + occ.sum()
            st = st + stats
        return tot, st

    for f, name in ((k1, "anyhit x1"), (k3, "anyhit x3")):
        o, st = f(oo, dd)
        _sync(o)  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o, st = f(oo, dd)
            _sync(o)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms  (stats {np.asarray(st)})",
              flush=True)

    # ---- eye pass alone -------------------------------------------------
    @jax.jit
    def eye1(org, dirn):
        h = closest_hit(scene, org, dirn)
        return h["t"].sum()

    @jax.jit
    def eye3(org, dirn):
        tot = jnp.float32(0)
        for i in range(3):
            h = closest_hit(scene, org + 0.0 * tot, dirn)
            tot = tot + h["t"].sum()
        return tot

    for f, name in ((eye1, "eye x1"), (eye3, "eye x3")):
        o = f(org, dirn)
        _sync(o)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(org, dirn)
            _sync(o)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

    # ---- cone-tile assembly alone --------------------------------------
    @jax.jit
    def asm1(P_off, b0, b1, b2, hit, key):
        oo, dd, order, live, _ = pb._conetile_rays(
            scene, P_off, b0, b1, b2, hit, key, 8, 8, pb._cone_k())
        return oo.sum() + dd.sum() + order.sum()

    @jax.jit
    def asm3(P_off, b0, b1, b2, hit, key):
        tot = jnp.float32(0)
        for i in range(3):
            oo, dd, order, live, _ = pb._conetile_rays(
                scene, P_off + 0.0 * tot, b0, b1, b2, hit, key, 8, 8,
                pb._cone_k())
            tot = tot + oo.sum() + dd.sum() + order.sum()
        return tot

    for f, name in ((asm1, "assembly x1"), (asm3, "assembly x3")):
        o = f(P_off, b0, b1, b2, hit, key)
        _sync(o)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(P_off, b0, b1, b2, hit, key)
            _sync(o)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
