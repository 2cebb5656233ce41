"""Integrator registry + dispatch by render method.

Equivalent of ri_transport_sample's role as the integrator entry
(transport.c:51) and the Option "renderer" "method" selection
(option.c:525-560), minus the reference's hardwired AO call
(render.c:803): here the method name actually selects the integrator.

Every integrator shares one wavefront contract:
    fn(scene, lights, org, dirn, key, **options) -> (radiance (B,3), aux)
"""

from __future__ import annotations

from lucille_tpu.base.log import LOG_WARN, log_once


def get_integrator(name: str):
    from lucille_tpu.transport.ao import ao_radiance
    from lucille_tpu.transport.pathtrace import path_radiance
    from lucille_tpu.transport.whitted import whitted_radiance
    from lucille_tpu.transport.dirtmap import dirtmap_radiance

    name = (name or "").lower()
    if name in ("ao", "ambientocclusion", "mcraytrace", "default", ""):
        # the reference hardwires AO as the default transport
        # (render.c:803); we honor that as the default method
        def ao_fn(scene, lights, org, dirn, key, *, gather_nsamples=64,
                  max_depth=8, bgcolor=(0, 0, 0), textures=None):
            import numpy as np

            ntheta = max(1, int(np.sqrt(gather_nsamples)))
            return ao_radiance(scene, org, dirn, key, ntheta, ntheta,
                               textures=textures, lights=lights)

        return ao_fn
    if name == "whitted":
        def whitted_fn(scene, lights, org, dirn, key, *, gather_nsamples=64,
                       max_depth=8, bgcolor=(0, 0, 0), textures=None):
            return whitted_radiance(
                scene, lights, org, dirn, key, max_depth=max_depth,
                bgcolor=bgcolor, textures=textures,
            )

        return whitted_fn
    if name in ("pathtrace", "path", "mlt"):
        if name == "mlt":
            log_once(LOG_WARN, "method 'mlt' unimplemented; using pathtrace")

        def path_fn(scene, lights, org, dirn, key, *, gather_nsamples=64,
                    max_depth=10, bgcolor=(0, 0, 0), textures=None):
            return path_radiance(
                scene, lights, org, dirn, key, max_depth=max_depth,
                bgcolor=bgcolor, textures=textures,
            )

        return path_fn
    if name in ("shader", "sl", "shade"):
        from lucille_tpu.transport.shaded import shaded_radiance

        def shaded_fn(scene, lights, org, dirn, key, *, gather_nsamples=64,
                      max_depth=8, bgcolor=(0, 0, 0), textures=None,
                      shader_table=None):
            return shaded_radiance(
                scene, lights, org, dirn, key, shader_table=shader_table,
                max_depth=max_depth, bgcolor=bgcolor, textures=textures,
            )

        return shaded_fn
    if name == "dirtmap":
        def dirt_fn(scene, lights, org, dirn, key, *, gather_nsamples=64,
                    max_depth=8, bgcolor=(0, 0, 0), textures=None):
            import numpy as np

            ntheta = max(1, int(np.sqrt(gather_nsamples)))
            return dirtmap_radiance(scene, org, dirn, key, ntheta, ntheta)

        return dirt_fn
    log_once(LOG_WARN, "unknown render method '%s'; using AO", name)
    return get_integrator("ao")
