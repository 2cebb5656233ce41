"""Multi-device scaling-efficiency harness.

BASELINE target: >= 80% rays/s scaling efficiency from 1 chip upward.
Measures the sharded tile renderer (parallel/mesh.py) on 1..N devices of
whatever backend is active and prints one JSON line per mesh size plus a
summary.  On this container real multi-chip hardware is absent, so CPU
runs (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
validate the mechanism; the same harness runs unchanged on a pod slice.

    python bench_scaling.py [--devices 1 2 4 8] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--gather", type=int, default=16)
    a = ap.parse_args()

    import jax

    from lucille_tpu.parallel.mesh import make_mesh, render_frame_sharded
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib_file

    ndev_avail = len(jax.devices())
    sizes = a.devices or [n for n in (1, 2, 4, 8) if n <= ndev_avail]

    state = RiState()
    parse_rib_file(
        "/root/reference/examples/ambient_occlusion/ambient_occlusion.rib",
        state,
    )
    state.Format(a.size, a.size * 3 // 4)
    state.options.gather_nsamples = a.gather

    results = []
    for n in sizes:
        mesh = make_mesh(n)
        # warm (compile + claim)
        render_frame_sharded(state.scene, mesh, tile=a.tile)
        t0 = time.perf_counter()
        _img, nrays = render_frame_sharded(state.scene, mesh, tile=a.tile)
        dt = time.perf_counter() - t0
        rps = nrays / dt
        results.append((n, rps))
        print(
            json.dumps(
                {
                    "metric": "rays_per_sec",
                    "devices": n,
                    "value": rps,
                    "seconds": dt,
                }
            )
        )

    if len(results) > 1:
        base_n, base_rps = results[0]
        last_n, last_rps = results[-1]
        eff = (last_rps / last_n) / (base_rps / base_n)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "from_devices": base_n,
                    "to_devices": last_n,
                    "value": eff,
                    "target": 0.8,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
