"""BVH visualizer: traversal-cost heatmaps + node-box wireframe dumps.

The headless counterpart of the reference testbed's BVHVisualizer.cpp
(src/testbed/) and of the per-query visual diagnostics compiled in via
RI_BVH_ENABLE_DIAGNOSTICS (bvh.h:95-104): renders the scene's BVH
traversal statistics from the scene camera —

    python tools_tpu/bvh_viz.py scene.rib -o heat.hdr           # heatmap
    python tools_tpu/bvh_viz.py scene.rib --boxes nodes.obj     # wireframe
    python tools_tpu/bvh_viz.py scene.rib --metric ntris        # tri tests

The heatmap encodes per-pixel node visits (or leaf visits / triangle
tests) through a blue-to-red ramp; the OBJ dump writes every BVH node's
AABB as 12 'l' line segments (leaf nodes only with --leaves), viewable
in any DCC.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def heatmap(values, lo=None, hi=None):
    """(H, W) scalar -> (H, W, 3) blue->cyan->yellow->red ramp."""
    v = values.astype(np.float64)
    lo = float(v.min()) if lo is None else lo
    hi = float(v.max()) if hi is None else hi
    x = np.clip((v - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def render_diag(rib_path, width=None, height=None, metric="nvisits"):
    import jax.numpy as jnp

    from lucille_tpu.accel.traverse import bvh_diag
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib_file
    from lucille_tpu.scene.compile import compile_scene

    state = RiState()
    parse_rib_file(rib_path, state)
    if width or height:
        state.Format(width or state.options.width, height or state.options.height)
    W, H = state.options.width, state.options.height
    scene = compile_scene(state.scene, build_bvh=True).device_put()

    xs, ys = np.meshgrid(
        np.arange(W, dtype=np.float32) + 0.5,
        np.arange(H, dtype=np.float32) + 0.5,
    )
    org, dirn = state.camera.generate_rays(
        jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel())
    )
    d = bvh_diag(scene, org, dirn)
    stats = {
        k: np.asarray(d[k]).reshape(H, W) for k in ("nvisits", "nleafs", "ntris")
    }
    return stats[metric], stats, scene


def dump_boxes_obj(scene, path, leaves_only=False):
    """Write BVH node AABBs as OBJ line segments."""
    bbmin = np.asarray(scene.node_bbmin)
    bbmax = np.asarray(scene.node_bbmax)
    count = np.asarray(scene.node_count)
    n = scene.n_nodes
    E = [
        (0, 1), (1, 3), (3, 2), (2, 0),
        (4, 5), (5, 7), (7, 6), (6, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    with open(path, "w") as f:
        f.write("# BVH node boxes (lucille_tpu bvh_viz)\n")
        vi = 1
        for i in range(n):
            if leaves_only and count[i] == 0:
                continue
            lo, hi = bbmin[i], bbmax[i]
            corners = [
                (lo[0] if not (k & 1) else hi[0],
                 lo[1] if not (k & 2) else hi[1],
                 lo[2] if not (k & 4) else hi[2])
                for k in range(8)
            ]
            for c in corners:
                f.write(f"v {c[0]:.6f} {c[1]:.6f} {c[2]:.6f}\n")
            for a, b in E:
                f.write(f"l {vi + a} {vi + b}\n")
            vi += 8
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description="BVH traversal visualizer")
    p.add_argument("rib")
    p.add_argument("-o", "--output", default="bvh_heat.hdr")
    p.add_argument("--metric", choices=["nvisits", "nleafs", "ntris"],
                   default="nvisits")
    p.add_argument("--width", type=int)
    p.add_argument("--height", type=int)
    p.add_argument("--boxes", help="also dump node AABBs to this OBJ file")
    p.add_argument("--leaves", action="store_true",
                   help="only leaf boxes in the OBJ dump")
    args = p.parse_args(argv)

    img_stat, stats, scene = render_diag(
        args.rib, args.width, args.height, args.metric
    )
    from lucille_tpu.imageio.rgbe import write_hdr

    write_hdr(args.output, heatmap(img_stat)[::-1])
    print(
        f"{args.output}: {args.metric} min {img_stat.min()} max {img_stat.max()} "
        f"mean {img_stat.mean():.1f}"
    )
    if args.boxes:
        dump_boxes_obj(scene, args.boxes, leaves_only=args.leaves)
        print(f"{args.boxes}: {scene.n_nodes} node boxes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
