"""Device-mesh tile sharding.

Design (SURVEY.md sections 2.8 and 7):

- the frame's tiles form the data-parallel axis — the moral successor of
  lucille's bucket queue, but STATIC: tile t goes to device t % n, no
  queue, no locks;
- the scene is replicated to every device (it is read-only render state,
  like lucille's per-process scene after each MPI rank parses the RIB);
- each device renders its tile slab with the same fused kernel the
  single-chip path uses; per-device ray/test counters are reduced with
  `psum` over the mesh — the analog of the MPI gather at frame end
  (render.c:1219-1243);
- the host assembles the image from the sharded output (host-0 display
  ownership).

Multi-host: the same code runs under `jax.distributed.initialize`; the
mesh then spans hosts and tile slabs ride DCN automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, axis: str = "tiles", devices=None
) -> Mesh:
    """Mesh over the first n devices.  When the default backend has too
    few (e.g. the single tunneled TPU here), falls back to the virtual
    CPU pool rather than silently truncating — a 1-device mesh labeled
    "8 devices" measures nothing."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count)"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_tile_renderer(
    mesh: Mesh,
    camera,
    tile: int,
    xsamples: int,
    ysamples: int,
    ntheta: int,
    nphi: int,
):
    """Build a jitted, shard_map'ed function rendering a batch of tiles.

    Returned fn signature:
        fn(scene, origins (T, 2) i32, jitter (S, 2) f32, keys (T,) PRNG)
            -> (tiles (T, tile, tile, 3) f32, stats dict)
    T must be a multiple of the mesh size; the caller pads with dummy
    origins (rendered but discarded — the static-shape analog of empty
    buckets).
    """
    from jax import shard_map

    from lucille_tpu.transport.ao import ao_radiance

    axis = mesh.axis_names[0]
    S = xsamples * ysamples

    def render_one(scene, origin, jitter, key):
        x0 = origin[0].astype(jnp.float32)
        y0 = origin[1].astype(jnp.float32)
        xs = jnp.arange(tile, dtype=jnp.float32)
        ys = jnp.arange(tile, dtype=jnp.float32)
        px = x0 + xs[None, :, None]
        py = y0 + ys[:, None, None]
        jx = jitter[:, 0][None, None, :]
        jy = jitter[:, 1][None, None, :]
        shape = (tile, tile, S)
        fx = jnp.broadcast_to(px + jx, shape).reshape(-1)
        fy = jnp.broadcast_to(py + jy, shape).reshape(-1)
        org, dirn = camera.generate_rays(fx, fy)
        radiance, aux = ao_radiance(scene, org, dirn, key, ntheta, nphi)
        img = radiance.reshape(tile, tile, S, 3).mean(axis=2)
        nrays = fx.shape[0] + jnp.sum(aux["hit"].astype(jnp.int32)) * (
            ntheta * nphi
        )
        return img, nrays

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(axis)),
        out_specs=(P(axis), P()),
        # the traversal while_loop's carry mixes replicated literals with
        # varying ray state; skip the vma type check (the data flow is
        # correct: every tile is independent, counters psum at the end)
        check_vma=False,
    )
    def work(scene, origins, jitter, keys):
        def body(carry, inp):
            origin, key = inp
            img, nrays = render_one(scene, origin, jitter, key)
            return carry + nrays, img
        total, imgs = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), (origins, keys)
        )
        # reduce ray counters over the mesh (MPI-gather analog)
        total = jax.lax.psum(total, axis)
        return imgs, total

    return jax.jit(work)


def render_frame_sharded(desc, mesh: Mesh | None = None, key=None, tile: int = 64):
    """Render a full frame with tiles sharded over the mesh.

    Returns (image (H, W, 3) float32, nrays).  The single-device analog of
    Renderer.render_frame, used by multi-chip tests and dryrun_multichip.
    """
    from lucille_tpu.render.renderer import _FrozenCamera
    from lucille_tpu.render.tiles import tile_list
    from lucille_tpu.sampling.hammersley import subpixel_samples
    from lucille_tpu.scene.compile import compile_scene

    if mesh is None:
        mesh = make_mesh()
    if key is None:
        key = jax.random.key(0)

    opt = desc.options
    W, H = opt.width, opt.height
    disp = opt.current_display()
    xsamples, ysamples = int(disp.sampling_rates[0]), int(disp.sampling_rates[1])
    ntheta = max(1, int(np.sqrt(opt.gather_nsamples)))

    scene = compile_scene(desc).device_put()
    camera = _FrozenCamera.from_camera(desc.camera)
    jitter_np, _ = subpixel_samples(xsamples, ysamples)
    jitter = jnp.asarray(jitter_np, dtype=jnp.float32)

    tiles = tile_list(W, H, tile, opt.bucket_order)
    n_dev = mesh.devices.size
    T = len(tiles)
    T_pad = -(-T // n_dev) * n_dev
    origins = np.zeros((T_pad, 2), dtype=np.int32)
    for i, (x0, y0, _, _) in enumerate(tiles):
        origins[i] = (x0, y0)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(T_pad))

    fn = sharded_tile_renderer(
        mesh, camera, tile, xsamples, ysamples, ntheta, ntheta
    )
    imgs, nrays = fn(scene, jnp.asarray(origins), jitter, keys)
    imgs = np.asarray(imgs)

    image = np.zeros((H, W, 3), dtype=np.float32)
    for i, (x0, y0, _, _) in enumerate(tiles):
        th = min(tile, H - y0)
        tw = min(tile, W - x0)
        image[y0 : y0 + th, x0 : x0 + tw] = imgs[i, :th, :tw]
    return image, int(nrays)
