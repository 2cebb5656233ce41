"""sisgen: Structured Importance Sampling preprocessor for environment maps.

Successor of the reference's tools/sis (Agarwal, Ramamoorthi, Belongie,
Jensen, "Structured Importance Sampling of Environment Maps", SIGGRAPH
2003; consumed via light->sisfile, light.h:51-52): converts an HDR
environment map into a small deterministic set of directional samples
with pre-integrated radiance, so render-time lighting needs no RNG.

Algorithm (faithful to the paper's structure, vectorized in NumPy):

1. importance metric per texel: L * dOmega^{1/4} (the paper's L Delta^a
   with a = 1/4 for the visibility-aware metric);
2. hierarchical stratification: texels are split into luminance layers
   by thresholds  L_i = L_max / 4^i;
3. within each layer, samples are allocated proportionally to total
   importance and placed by k-means (Lloyd) relaxation on the sphere,
   seeded by importance-weighted picks;
4. each sample's radiance weight is the summed radiance*dOmega of the
   texels in its Voronoi cell — energy is exactly partitioned.

Output: a .npz with dirs (S, 3), rgb (S, 3) — loadable by
lucille_tpu.lights.ibl.sample_env_structured — plus an optional text
dump matching the spirit of gensamples.dat.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def generate_sis_samples(image: np.ndarray, nsamples: int = 64, nlayers: int = 6,
                         lloyd_iters: int = 8, seed: int = 0):
    """Return (dirs (S, 3), rgb (S, 3)) structured samples for a lat-long
    environment image."""
    from lucille_tpu.lights.ibl import latlong_directions

    img = np.asarray(image, dtype=np.float64)
    h, w = img.shape[:2]
    dirs, solid = latlong_directions(h, w)
    dirs = dirs.reshape(-1, 3)
    solid = solid.reshape(-1)
    rgb = img.reshape(-1, 3)
    lum = rgb.mean(axis=-1)

    importance = lum * np.power(np.maximum(solid, 1e-12), 0.25)
    total_imp = importance.sum()
    if total_imp <= 0:
        return np.zeros((0, 3)), np.zeros((0, 3))

    # luminance layers: L_max / 4^i thresholds
    lmax = lum.max()
    layer_of = np.zeros(len(lum), dtype=np.int64)
    for i in range(1, nlayers):
        layer_of[lum < lmax / (4.0**i)] = i

    rng = np.random.default_rng(seed)
    all_dirs = []
    all_centers_idx = []
    for layer in range(nlayers):
        mask = layer_of == layer
        if not mask.any():
            continue
        imp = importance[mask]
        frac = imp.sum() / total_imp
        k = max(1, int(round(nsamples * frac))) if frac > 1e-6 else 0
        if k == 0:
            continue
        idx = np.nonzero(mask)[0]
        # importance-weighted seeding
        p = imp / imp.sum()
        seeds = rng.choice(len(idx), size=min(k, len(idx)), replace=False, p=p)
        centers = dirs[idx[seeds]]
        # Lloyd relaxation within the layer
        ld = dirs[idx]
        lw = imp
        for _ in range(lloyd_iters):
            sim = ld @ centers.T  # cosine similarity
            assign = sim.argmax(axis=1)
            for c in range(len(centers)):
                m = assign == c
                if m.any():
                    v = (ld[m] * lw[m, None]).sum(axis=0)
                    n = np.linalg.norm(v)
                    if n > 1e-12:
                        centers[c] = v / n
        all_dirs.append(centers)
        all_centers_idx.append(idx)

    if not all_dirs:
        return np.zeros((0, 3)), np.zeros((0, 3))
    centers = np.concatenate(all_dirs)

    # energy partition: each texel's radiance*solid goes to its nearest center
    sim = dirs @ centers.T
    assign = sim.argmax(axis=1)
    weights = np.zeros((len(centers), 3))
    np.add.at(weights, assign, rgb * solid[:, None])
    return centers.astype(np.float32), weights.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("envmap", help="lat-long .hdr environment map")
    ap.add_argument("-n", "--nsamples", type=int, default=64)
    ap.add_argument("-o", "--out", default="gensamples.npz")
    ap.add_argument("--text", help="also write a text dump (dir xyz + rgb)")
    a = ap.parse_args()

    from lucille_tpu.imageio.loader import load_image

    img = load_image(a.envmap)
    dirs, rgb = generate_sis_samples(img, a.nsamples)
    np.savez(a.out, dirs=dirs, rgb=rgb)
    print(f"wrote {a.out}: {len(dirs)} structured samples")
    if a.text:
        with open(a.text, "w") as f:
            for d, c in zip(dirs, rgb):
                f.write(f"{d[0]} {d[1]} {d[2]}  {c[0]} {c[1]} {c[2]}\n")
        print(f"wrote {a.text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
