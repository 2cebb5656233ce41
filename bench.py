"""Benchmark: AO render throughput on the default backend (TPU).

Prints ONE JSON line:
    {"metric": "rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": R}

The baseline is CPU-lucille on the same container (the reference publishes
no numbers — SURVEY.md section 6): lucille compiled with gcc -O2 and driven
through its Ri* API on examples/ambient_occlusion at 160x120, 3x3 pixel
samples, 64 gather rays prints 5.26 M rays/sec (2 pthreads, this host,
measured 2026-08-17; see tests/golden/gen_ri_driver.py for the harness).
Ray counting matches the reference's (raytrace.c:96): eye rays + hemisphere
rays for primary hits only.

The bench scene is the same bundled ambient_occlusion.rib at 640x480
(lucille's default resolution), 3x3 subpixel samples, 64 AO rays.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_CPU_RAYS_PER_SEC = 5.256651e6  # CPU-lucille, measured (see docstring)
# CPU-lucille on plane_sphere Scene_DEFAULT_Set0.rib at 128x128 (the
# BASELINE.json north-star scene), same harness: 3.56 M rays/s
REFERENCE_CPU_PLANE_SPHERE = 3.56e6
# CPU-lucille ri_transport_whitted driven directly (the render loop
# hard-codes AO at render.c:803), same scene at 640x480 3x3, 2 pthreads,
# best of 3: tests/golden/gen_ri_driver.py --bench-whitted, measured
# 2026-08-21.  Note the reference's whitted SHADES nothing without an
# envmap (whitted.c:120-150) — this is a pure ray-throughput baseline.
REFERENCE_CPU_WHITTED = 8.83e6
# CPU-lucille gather_sunsky AO on the bundled scene (BASELINE.md r4)
REFERENCE_CPU_SUNSKY_AO = 1.73e6
# The reference's pathtracer (src/transport/pathtrace.c) does NOT
# compile against the reference's own current headers (pre-vector-API
# code: ri_vector_copy(&ray.org, ...) etc.; build_lucille.sh skips it),
# so no CPU pathtrace baseline is establishable from the shipped source.
REFERENCE_CPU_PATHTRACE = None

RIB = "/root/reference/examples/ambient_occlusion/ambient_occlusion.rib"
RIB_PS = "/root/reference/examples/plane_sphere/Scene_DEFAULT_Set0.rib"


def _measure(rib, width, height, tile, method=None, inject=None):
    from lucille_tpu.render.renderer import Renderer
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib, parse_rib_file

    state = RiState()
    if inject:
        # splice extra RIB (e.g. a sunsky light) after WorldBegin
        import os

        text = open(rib).read().replace(
            "WorldBegin", "WorldBegin\n" + inject, 1
        )
        cwd = os.getcwd()
        os.chdir(os.path.dirname(rib))
        try:
            parse_rib(text, state)
        finally:
            os.chdir(cwd)
    else:
        parse_rib_file(rib, state)
    state.Format(width, height)
    if method is not None:
        state.options.render_method = method
    renderer = Renderer(state.scene, tile_size=tile)
    # warmup frame: pays the one-time device-claim latency + kernel
    # compile on the SAME renderer (a fresh Renderer would close over new
    # constants and recompile)
    renderer.render_frame()
    renderer.stats.nrays = 0
    renderer.stats.render_seconds = 0.0
    # best of two timed frames: the tunneled link's throughput swings
    # (docs/performance.md "Measurement discipline"), and one slow
    # transfer shouldn't define the round record.  Both samples are
    # returned so BENCH_r*.json records the statistic (N and raw
    # samples), keeping rounds comparable (VERDICT r4 weak 6).
    samples = []
    t0 = time.perf_counter()
    renderer.render_frame()
    samples.append(time.perf_counter() - t0)
    nrays = renderer.stats.nrays
    t0 = time.perf_counter()
    renderer.render_frame()
    samples.append(time.perf_counter() - t0)
    return nrays, min(samples), samples


def main() -> int:
    import jax

    import os

    width, height = 640, 480
    tile = int(os.environ.get("BENCH_TILE", "240"))

    rays, dt, frame_samples = _measure(RIB, width, height, tile)
    rays_per_sec = rays / dt

    # the BASELINE.json north-star scene (plane_sphere GI)
    ps = {}
    try:
        rays_ps, dt_ps, ps_samples = _measure(RIB_PS, 512, 512, 256)
        ps = {
            "plane_sphere_rays_per_sec": rays_ps / dt_ps,
            "plane_sphere_vs_baseline": rays_ps
            / dt_ps
            / REFERENCE_CPU_PLANE_SPHERE,
            "plane_sphere_seconds": dt_ps,
            "plane_sphere_frame_samples": ps_samples,
        }
    except (OSError, ValueError):  # reference tree absent
        pass

    # every non-AO integrator on the same bundled scene, so BENCH_r*.json
    # catches regressions off the AO path (VERDICT r1 weak item 4).
    # NOTE (r4): bounce ray accounting now counts LIVE lanes only
    # (raytrace.c:96 counts actual ri_raytrace calls; counting the full
    # wavefront width per bounce inflated pathtrace ~5x in r2/r3).
    # Compare *_seconds across rounds, not Mrays/s, for those two.
    # whitted_vs_baseline compares against the direct-driven
    # ri_transport_whitted (REFERENCE_CPU_WHITTED above);
    # pathtrace_vs_baseline is null — see REFERENCE_CPU_PATHTRACE.
    for method in ("whitted", "pathtrace"):
        try:
            rays_m, dt_m, m_samples = _measure(
                RIB, width, height, tile, method=method
            )
            ps[f"{method}_rays_per_sec"] = rays_m / dt_m
            ps[f"{method}_seconds"] = dt_m
            ps[f"{method}_frame_samples"] = m_samples
            base = (REFERENCE_CPU_WHITTED if method == "whitted"
                    else REFERENCE_CPU_PATHTRACE)
            ps[f"{method}_vs_baseline"] = (
                rays_m / dt_m / base if base else None
            )
        except (OSError, ValueError) as e:
            ps[f"{method}_error"] = str(e)

    # sunsky-AO on the same scene: must ride the fused Pallas path (the
    # per-stratum occlusion bitmask gather, transport/ao.py r4), so its
    # throughput stays within ~2x of plain AO instead of the ~5x-slower
    # wavefront scan it used to fall back to
    try:
        rays_sk, dt_sk, sk_samples = _measure(
            RIB, width, height, tile,
            inject='AreaLightSource "sunsky" 1 "hour" [10.0] '
                   '"turbidity" [2.2]\n',
        )
        ps["sunsky_ao_rays_per_sec"] = rays_sk / dt_sk
        ps["sunsky_ao_seconds"] = dt_sk
        ps["sunsky_ao_frame_samples"] = sk_samples
        ps["sunsky_ao_vs_baseline"] = rays_sk / dt_sk / REFERENCE_CPU_SUNSKY_AO
    except Exception as e:  # noqa: BLE001
        ps["sunsky_ao_error"] = f"{type(e).__name__}: {e}"

    # large-scene throughput (the 131k-tri tile-BVH point; bench_large.py
    # has the full CPU-vs-TPU sweep incl. the 1M-tri heightfield)
    try:
        from bench_large import measure as measure_large

        lg = measure_large(256)
        ps["heightfield_130k_rays_per_sec"] = lg["value"]
        # vs CPU-lucille, same workload, 2 threads (bench_large_driver.c)
        ps["heightfield_130k_vs_baseline"] = lg["vs_baseline"]
        ps["heightfield_130k_frame_samples"] = lg["frame_samples"]
    except Exception as e:  # noqa: BLE001 - bench must still print its line
        ps["heightfield_error"] = f"{type(e).__name__}: {e}"

    # the contested size class: 1,045,458 triangles (n=724), the scene
    # where CPU-lucille held 1.98 M rays/s through round 4.  The number
    # must live in the driver-captured record, not just docs
    # (VERDICT r4 weak 2 / next-step 1).
    try:
        from bench_large import measure as measure_large_1m

        lg1m = measure_large_1m(724)
        ps["heightfield_1m_rays_per_sec"] = lg1m["value"]
        ps["heightfield_1m_vs_baseline"] = lg1m["vs_baseline"]
        ps["heightfield_1m_seconds"] = lg1m["seconds"]
        ps["heightfield_1m_frame_samples"] = lg1m["frame_samples"]
    except Exception as e:  # noqa: BLE001 - bench must still print its line
        ps["heightfield_1m_error"] = f"{type(e).__name__}: {e}"

    print(
        json.dumps(
            {
                "metric": "rays_per_sec",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / REFERENCE_CPU_RAYS_PER_SEC,
                "detail": {
                    "scene": "ambient_occlusion.rib",
                    "resolution": f"{width}x{height}",
                    "pixel_samples": "3x3",
                    "gather_rays": 64,
                    "rays": rays,
                    "seconds": dt,
                    "frames_timed": 2,
                    "frame_samples": frame_samples,
                    "backend": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                    **ps,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
