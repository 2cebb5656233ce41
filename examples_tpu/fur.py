"""Fur demo: a patch of Bezier hair strands rendered with AO.

The scene shape of the reference's FurRender R&D renderer
(/root/reference/rnd/FurRender/main.cpp: Bezier strands over a ground
plane) on the production pipeline — strands tessellate to tubes
(ri/curves.py) and trace through the same tile kernels as every other
triangle.

    python examples_tpu/fur.py [--strands 400] [--out /tmp/fur.hdr]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def make_rib(out: str, nstrands: int, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    curves, nv = [], []
    for _ in range(nstrands):
        x, z = rng.uniform(-2.0, 2.0, 2)
        lean = rng.uniform(-0.5, 0.5, 2)
        h = rng.uniform(1.2, 2.0)
        cp = np.array(
            [
                [x, 0.0, z],
                [x + 0.25 * lean[0], 0.4 * h, z + 0.25 * lean[1]],
                [x + 0.7 * lean[0], 0.75 * h, z + 0.7 * lean[1]],
                [x + lean[0], h, z + lean[1]],
            ]
        )
        curves.append(cp)
        nv.append(4)
    P = " ".join(f"{v:.4f}" for v in np.concatenate(curves).reshape(-1))
    nvs = " ".join(str(v) for v in nv)
    return (
        f'Display "{out}" "file" "rgb"\n'
        "PixelSamples 2 2\n"
        'Projection "perspective" "fov" [45]\n'
        'Orientation "rh"\n'
        "ConcatTransform [1 0 0 0  0 0.9397 0.342 0 "
        "0 -0.342 0.9397 0  0 -0.6 -7 1]\n"
        "WorldBegin\n"
        'PointsPolygons [4] [0 3 2 1] "P" '
        "[-4 0 -4  4 0 -4  4 0 4  -4 0 4]\n"
        f'Curves "cubic" [{nvs}] "nonperiodic" "P" [{P}] '
        '"width" [0.05 0.04 0.02 0.005]\n'
        "WorldEnd\n"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strands", type=int, default=400)
    ap.add_argument("--out", default="/tmp/fur.hdr")
    ap.add_argument("--size", type=int, nargs=2, default=(320, 240))
    args = ap.parse_args()

    from lucille_tpu.render.renderer import Renderer
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib

    s = RiState()
    parse_rib(make_rib(args.out, args.strands), s)
    s.Format(*args.size)
    ntris = sum(g.ntriangles for g in s.scene.geoms)
    print(f"{args.strands} strands -> {ntris} triangles")
    r = Renderer(s.scene, tile_size=128)
    t0 = time.perf_counter()
    img = r.render_frame()
    print(
        f"rendered {args.size[0]}x{args.size[1]} in "
        f"{time.perf_counter() - t0:.2f}s "
        f"({r.stats.nrays / max(r.stats.render_seconds, 1e-9) / 1e6:.1f} "
        "Mrays/s)"
    )
    from lucille_tpu.imageio.loader import save_image

    save_image(args.out, np.asarray(img))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
