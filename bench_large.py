"""Large-scene benchmark: lucille_tpu vs CPU-lucille on a procedural
heightfield.

The scene is IDENTICAL to tests/golden/bench_large_driver.c (same
analytic terrain, camera, resolution, pixel samples, 64 AO gather
rays), so the numbers compare the same workload:

    # CPU baseline (2 threads, this container, 160x120 2x2ps):
    sh tests/golden/build_lucille.sh
    gcc -O2 -I/root/reference/include tests/golden/bench_large_driver.c \
        /tmp/lucille_cpu/liblucille.a -lm -lpthread -o /tmp/bench_large_cpu
    /tmp/bench_large_cpu <n>

    # measured 2026-08-18 (CPU-lucille, rays counted per raytrace.c:96):
    #   n=128   32,258 tris: 3.16 M rays/s   (BVH build 0.019 s)
    #   n=256  130,050 tris: 2.71 M rays/s   (BVH build 0.087 s)
    #   n=724 1,045,458 tris: 1.98 M rays/s  (BVH build 0.873 s)

Usage: python bench_large.py [n ...]   (default: 128 256)
Prints one JSON line per scene size.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

CPU_BASELINE = {128: 3.156830e6, 256: 2.714216e6, 724: 1.975286e6}

WIDTH, HEIGHT, PS = 160, 120, 2


def heightfield_scene(n: int):
    """The bench_large_driver.c terrain as a SceneDescription."""
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib

    i = np.arange(n, dtype=np.float32)
    x = -5.0 + 10.0 * i / (n - 1)
    xx, zz = np.meshgrid(x, x)  # zz varies along rows like the C driver
    yy = 0.5 * np.sin(1.3 * xx) * np.cos(1.1 * zz) + 0.25 * np.sin(
        2.7 * xx + 1.0
    ) * np.sin(1.9 * zz)
    P = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)

    jj, ii = np.meshgrid(
        np.arange(n - 1, dtype=np.int64), np.arange(n - 1, dtype=np.int64),
        indexing="ij",
    )
    a = jj * n + ii
    quads = np.stack([a, a + 1, a + n + 1, a + n], axis=-1).reshape(-1, 4)

    s = RiState()
    parse_rib(
        f'Display "/tmp/bench_large_tpu.hdr" "file" "rgb"\n'
        f"PixelSamples {PS} {PS}\n"
        'Projection "perspective" "fov" [45.0]\n'
        'Orientation "rh"\n'
        "ConcatTransform [0.994530 0.008385 -0.104111 0.000000 "
        "0.052799 0.819679 0.570385 0.000000 "
        "0.090120 -0.572762 0.814753 0.000000 "
        "-0.000009 -0.000015 -15.529361 1.000000 ]\n",
        s,
    )
    s.Format(WIDTH, HEIGHT)
    # inject the heightfield as one PointsPolygons (identity transform),
    # exactly like the C driver's RiPointsPolygonsV call
    s.WorldBegin()
    s.AttributeBegin()
    s.Transform(np.eye(4).reshape(-1))
    s.PointsPolygons(
        np.full(len(quads), 4, np.int64), quads.reshape(-1), {"P": P}
    )
    s.AttributeEnd()
    s.WorldEnd()
    return s


def measure(n: int, tile: int = 128):
    from lucille_tpu.render.renderer import Renderer

    s = heightfield_scene(n)
    t0 = time.perf_counter()
    r = Renderer(s.scene, tile_size=tile)
    build_s = time.perf_counter() - t0
    r.render_frame()  # warmup: compile + device claim
    r.stats.nrays = 0
    r.stats.render_seconds = 0.0
    # best-of-N timed frames, every sample recorded (the tunneled
    # link's throughput swings; docs/performance.md "Measurement
    # discipline").  N = 4 for the 1M scene — the record's contested
    # point, where a single slow transfer must not decide the round —
    # and bench.py's 2 elsewhere.
    nframes = 4 if n >= 724 else 2
    samples = []
    for _ in range(nframes):
        t0 = time.perf_counter()
        r.render_frame()
        samples.append(time.perf_counter() - t0)
    dt = min(samples)
    ntris = 2 * (n - 1) * (n - 1)
    rays_per_sec = r.stats.nrays / nframes / dt
    base = CPU_BASELINE.get(n)
    return {
        "metric": "large_scene_rays_per_sec",
        "n": n,
        "ntris": ntris,
        "value": rays_per_sec,
        "unit": "rays/s",
        "seconds": dt,
        "frame_samples": samples,
        "build_seconds": build_s,
        "accel": r.scene.accel,
        "ntrav": r.stats.ntraversals,
        "ntests": r.stats.ntriangle_tests,
        "ndma_miss": r.stats.extra.get("ndma_miss", 0),
        "vs_baseline": (rays_per_sec / base) if base else None,
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [128, 256]
    for n in sizes:
        print(json.dumps(measure(n)), flush=True)


if __name__ == "__main__":
    main()
