"""Inverse rendering demo: recover material parameters from a target HDR.

BASELINE config 5: "optimize BRDF + light params from target HDR via
pixel-loss gradients".  Renders a target with known materials, perturbs
them, and runs Adam on the L2 pixel loss — gradients flow through the
path tracer to per-geometry kd and color.

    python examples_tpu/inverse_render.py [--steps 80] [--out /tmp/inv]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--out", default="/tmp/inverse_render")
    a = ap.parse_args()

    from lucille_tpu.diff.render import differentiable_render
    from lucille_tpu.imageio.rgbe import write_hdr
    from lucille_tpu.lights.tables import build_light_tables
    from lucille_tpu.render.renderer import _FrozenCamera
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib
    from lucille_tpu.scene.compile import compile_scene

    W, H = a.size, a.size * 3 // 4
    s = RiState()
    parse_rib(
        'Projection "perspective" "fov" [45]\nOrientation "rh"\n'
        "ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  0 -2 -8 1]\n"
        "WorldBegin\n"
        'LightSource "domelight" 1 "intensity" [1.0]\n'
        'PointsPolygons [4] [0 3 2 1] "P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]\n'
        "AttributeBegin\nColor [0.9 0.4 0.2]\n"
        'PointsPolygons [3] [0 1 2] "P" [-1 0.5 -1  1 0.5 -1  0 2.5 0]\n'
        "AttributeEnd\nWorldEnd\n",
        s,
    )
    s.Format(W, H)
    s.camera.setup(s.world_to_camera, s.options.orientation)

    scene = compile_scene(s.scene).device_put()
    lights = build_light_tables(s.scene)
    camera = _FrozenCamera.from_camera(s.camera)
    render_fn, params = differentiable_render(
        scene, lights, camera, W, H, spp=4, max_depth=3
    )
    key = jax.random.key(0)

    true = {
        **params,
        "mat_kd": jnp.asarray([0.35, 0.9]),
        "mat_color": jnp.asarray([[1.0, 1.0, 1.0], [0.2, 0.5, 0.9]]),
    }
    target = render_fn(true, key)
    write_hdr(f"{a.out}_target.hdr", np.asarray(target))

    theta = {
        "mat_kd": jnp.asarray([0.6, 0.6]),
        "mat_color": jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]),
    }
    opt = optax.adam(0.05)
    state = opt.init(theta)

    @jax.jit
    def step(theta, state):
        def loss_fn(t):
            img = render_fn({**params, **t}, key)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(theta)
        updates, state = opt.update(g, state)
        theta = optax.apply_updates(theta, updates)
        theta = jax.tree.map(lambda x: jnp.clip(x, 0.0, 1.0), theta)
        return theta, state, loss

    write_hdr(f"{a.out}_init.hdr", np.asarray(render_fn({**params, **theta}, key)))
    for i in range(a.steps):
        theta, state, loss = step(theta, state)
        if i % 10 == 0 or i == a.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.6f}")
    final = render_fn({**params, **theta}, key)
    write_hdr(f"{a.out}_final.hdr", np.asarray(final))

    print("\nrecovered vs true:")
    print("  kd   ", np.asarray(theta["mat_kd"]), "vs", np.asarray(true["mat_kd"]))
    print("  color\n", np.asarray(theta["mat_color"]), "\nvs\n",
          np.asarray(true["mat_color"]))
    print(f"wrote {a.out}_{{target,init,final}}.hdr")
    return 0


if __name__ == "__main__":
    sys.exit(main())
