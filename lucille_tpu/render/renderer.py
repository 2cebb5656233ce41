"""Frame renderer: tile orchestration over a jit-compiled render kernel.

The TPU-native equivalent of ri_render_frame (src/render/render.c:317-369)
and its bucket machinery (render.c:582-710, 1043-1207):

- the image is cut into fixed-size tiles (static shapes -> ONE compiled
  kernel for every tile);
- per tile, the kernel generates the deterministic sigma-Hammersley
  subpixel rays (render.c:830-917), runs the integrator wavefront, and
  box-filters subsamples into pixels (render.c:715-823);
- tiles run in spiral order by default for progressive display
  (render.c:198), streaming each finished tile to the display drivers —
  the mutex-guarded bucket_write of the reference becomes a plain host
  callback since device work is already serialized per tile;
- statistics (rays, triangle tests, Mrays/sec — raytrace.c:71-112) and
  phase timers (render.c:1243) are accumulated host-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import numpy as np

from lucille_tpu.base.log import LOG_DEBUG, LOG_INFO, log
from lucille_tpu.base.stats import RenderStats
from lucille_tpu.base.timer import get_timer
from lucille_tpu.render.tiles import tile_list
from lucille_tpu.sampling.hammersley import subpixel_samples
from lucille_tpu.scene.compile import compile_scene


@partial(
    __import__("jax").jit,
    static_argnames=("tile", "xsamples", "ysamples", "ntheta", "nphi", "camera"),
)
def _render_tile_kernel(
    scene,
    camera,
    x0,
    y0,
    jitter,
    key,
    tile: int,
    xsamples: int,
    ysamples: int,
    ntheta: int,
    nphi: int,
):
    """Render one tile: returns (tile, tile, 3) radiance + aux counters.

    `camera` is passed as a static arg (hashable dataclass captured by
    closure semantics would retrace anyway; the camera is fixed per frame).
    """
    import jax
    import jax.numpy as jnp

    from lucille_tpu.transport.ao import ao_radiance

    S = xsamples * ysamples
    xs = jnp.arange(tile, dtype=jnp.float32)
    ys = jnp.arange(tile, dtype=jnp.float32)
    px = x0.astype(jnp.float32) + xs[None, :, None]  # (1, tile, 1)
    py = y0.astype(jnp.float32) + ys[:, None, None]  # (tile, 1, 1)
    # subpixel jitter (S, 2), deterministic (sample_subpixel semantics)
    jx = jitter[:, 0][None, None, :]
    jy = jitter[:, 1][None, None, :]
    shape = (tile, tile, S)
    fx = jnp.broadcast_to(px + jx, shape).reshape(-1)  # (tile*tile*S,)
    fy = jnp.broadcast_to(py + jy, shape).reshape(-1)

    org, dirn = camera.generate_rays(fx, fy)
    radiance, aux = ao_radiance(scene, org, dirn, key, ntheta, nphi)
    img = radiance.reshape(tile, tile, S, 3).mean(axis=2)
    return img, {
        "ntests": aux["ntests"],
        "ntrav": aux["ntrav"],
        # rays counted the reference's way (raytrace.c increments per
        # ri_raytrace call): eye rays + hemisphere rays for HITS only
        "nrays": fx.shape[0] + jnp.sum(aux["hit"].astype(jnp.int32)) * (ntheta * nphi),
        "hit": aux["hit"].reshape(tile, tile, S).any(axis=2),
    }


@dataclass
class Renderer:
    """Holds the compiled scene + camera and renders frames."""

    desc: "SceneDescription"
    tile_size: int = 64
    stats: RenderStats = field(default_factory=RenderStats)

    def __post_init__(self):
        timer = get_timer()
        timer.start("Scene compile")
        self.scene = compile_scene(self.desc).device_put()
        timer.end("Scene compile")
        self.camera = self.desc.camera
        # freeze the camera for static-arg hashing
        self._frozen_camera = _FrozenCamera.from_camera(self.camera)

    def render_frame(
        self,
        tile_cb: Optional[Callable] = None,
        progress_cb: Optional[Callable] = None,
        key=None,
    ) -> np.ndarray:
        """Render the full frame; returns (H, W, 3) float32.

        tile_cb(x0, y0, tile_np) streams finished tiles (bucket_write
        equivalent, render.c:1152-1158).
        """
        import jax
        import jax.numpy as jnp

        opt = self.desc.options
        W, H = opt.width, opt.height
        disp = opt.current_display()
        xsamples = int(disp.sampling_rates[0])
        ysamples = int(disp.sampling_rates[1])
        nsamples = opt.gather_nsamples
        ntheta = max(1, int(np.sqrt(nsamples)))
        nphi = ntheta  # reference: evenly split (ambientocclusion.c:380)

        jitter_np, _inst = subpixel_samples(xsamples, ysamples)
        jitter = jnp.asarray(jitter_np, dtype=jnp.float32)
        if key is None:
            key = jax.random.key(0)

        tiles = tile_list(W, H, self.tile_size, opt.bucket_order)
        image = np.zeros((H, W, 3), dtype=np.float32)

        timer = get_timer()
        timer.start("Render frame")

        ntests_total = 0
        ntrav_total = 0
        for ti, (x0, y0, _i, _j) in enumerate(tiles):
            tkey = jax.random.fold_in(key, ti)
            img, aux = _render_tile_kernel(
                self.scene,
                self._frozen_camera,
                jnp.int32(x0),
                jnp.int32(y0),
                jitter,
                tkey,
                tile=self.tile_size,
                xsamples=xsamples,
                ysamples=ysamples,
                ntheta=ntheta,
                nphi=nphi,
            )
            tile_np = np.asarray(img)
            th = min(self.tile_size, H - y0)
            tw = min(self.tile_size, W - x0)
            image[y0 : y0 + th, x0 : x0 + tw] = tile_np[:th, :tw]
            self.stats.add(nrays=int(aux["nrays"]))
            ntests_total += int(aux["ntests"]) if np.ndim(aux["ntests"]) == 0 else 0
            ntrav_total += int(aux["ntrav"]) if np.ndim(aux["ntrav"]) == 0 else 0
            if tile_cb:
                tile_cb(x0, y0, tile_np[:th, :tw])
            if progress_cb:
                progress_cb((ti + 1) / len(tiles))
        self.stats.render_seconds += timer.end("Render frame")
        self.stats.add(ntriangle_tests=ntests_total, ntraversals=ntrav_total)
        log(
            LOG_INFO,
            "frame done: %d tiles, %.2f Mrays/s",
            len(tiles),
            self.stats.mrays_per_sec,
        )
        return image


class _FrozenCamera:
    """Hashable camera snapshot usable as a jit static argument."""

    def __init__(self, fields: tuple):
        self._fields = fields
        (
            self.horizontal_resolution,
            self.vertical_resolution,
            self.camera_projection,
            self.is_rh,
            self.flength,
            c2w_bytes,
            shape,
        ) = fields
        self.camera_to_world = np.frombuffer(c2w_bytes).reshape(shape)

    @staticmethod
    def from_camera(cam) -> "_FrozenCamera":
        c2w = np.ascontiguousarray(cam.camera_to_world, dtype=np.float64)
        return _FrozenCamera(
            (
                cam.horizontal_resolution,
                cam.vertical_resolution,
                cam.camera_projection,
                cam.is_rh,
                cam.flength,
                c2w.tobytes(),
                c2w.shape,
            )
        )

    # borrow the real camera's ray-gen methods
    ray_constants = __import__(
        "lucille_tpu.ri.camera", fromlist=["Camera"]
    ).Camera.ray_constants
    generate_rays = __import__(
        "lucille_tpu.ri.camera", fromlist=["Camera"]
    ).Camera.generate_rays

    def __hash__(self):
        return hash(self._fields)

    def __eq__(self, other):
        return isinstance(other, _FrozenCamera) and self._fields == other._fields


def render_frame(desc, **kwargs) -> np.ndarray:
    """One-shot convenience: SceneDescription -> (H, W, 3) image."""
    return Renderer(desc, tile_size=desc.options.tile_size).render_frame(**kwargs)
