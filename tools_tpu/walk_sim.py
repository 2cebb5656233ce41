"""Design-space simulator for the tile-BVH AO gather (pallas_bvh.py).

Replays the skip-link walk host-side on the REAL tile BVH of the
bench_large heightfield, over synthetic-but-representative AO blocks
(256 Morton-sorted origins on the terrain, stratified hemisphere
directions), and reports the counts that decide kernel design:

  per (block, stratum) walk:  nodes tested, leaves reached, tiles whose
                              own bbox is also reached (per-tile culling)
  per block hemisphere walk:  nodes tested, candidate leaves (the
                              working set an all-strata-at-once design
                              would touch)

Usage: python tools_tpu/walk_sim.py [n] [nblocks]
"""

from __future__ import annotations

import sys

import numpy as np


def terrain_height(x, z):
    return 0.5 * np.sin(1.3 * x) * np.cos(1.1 * z) + 0.25 * np.sin(
        2.7 * x + 1.0
    ) * np.sin(1.9 * z)


def build(n):
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench_large import heightfield_scene
    from lucille_tpu.scene.compile import compile_scene

    s = heightfield_scene(n)
    return compile_scene(s.scene)


def make_blocks(scene, nblocks, rng):
    """Blocks of 256 origins on the terrain, each a small contiguous
    patch — what Morton compaction of a 160x120 render actually yields
    (76800 rays over the 10x10 terrain -> a 256-ray block covers ~0.6
    units on a side)."""
    patch = 0.6
    Ps, Ns = [], []
    for _ in range(nblocks):
        cx, cz = rng.uniform(-4.2, 4.2, 2)
        x = cx + rng.uniform(-patch / 2, patch / 2, 256)
        z = cz + rng.uniform(-patch / 2, patch / 2, 256)
        y = terrain_height(x, z) + 1e-3
        P = np.stack([x, y, z], -1).astype(np.float32)
        e = 1e-3
        dx = (terrain_height(x + e, z) - terrain_height(x - e, z)) / (2 * e)
        dz = (terrain_height(x, z + e) - terrain_height(x, z - e)) / (2 * e)
        N = np.stack([-dx, np.ones_like(dx), -dz], -1)
        N /= np.linalg.norm(N, axis=-1, keepdims=True)
        Ps.append(P)
        Ns.append(N.astype(np.float32))
    return np.stack(Ps), np.stack(Ns)


def ortho(n):
    up = np.where(
        (np.abs(n[:, 0]) < 0.6)[:, None],
        [1.0, 0, 0],
        np.where((np.abs(n[:, 1]) < 0.6)[:, None], [0, 1.0, 0], [0, 0, 1.0]),
    )
    b0 = np.cross(up, n)
    b0 /= np.linalg.norm(b0, axis=-1, keepdims=True)
    b1 = np.cross(n, b0)
    b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
    return b0, b1, n


def strat_dirs(b0, b1, b2, ntheta, nphi, rng):
    S = ntheta * nphi
    u = rng.random((2, b0.shape[0]))
    out = []
    for s in range(S):
        i, j = s % ntheta, s // ntheta
        z0 = (i + u[0]) / ntheta
        z1 = (j + u[1]) / nphi
        ct = np.sqrt(z0)
        ph = 2 * np.pi * z1
        lx, ly = np.cos(ph) * ct, np.sin(ph) * ct
        lz = np.sqrt(np.maximum(1 - z0, 0))
        out.append(lx[:, None] * b0 + ly[:, None] * b1 + lz[:, None] * b2)
    return np.stack(out)  # (S, 256, 3)


def walk(nbox, skip, first, count, tbox, o, d, hemi_h=None):
    """One block walk; returns (nodes_tested, leaves, tiles, tiles_live).

    o: (256, 3); d: (256, 3) or (K, 256, 3) — K directions per lane walk
    together (reach = any over all K x 256 rays; the K-strata-batching
    design).  hemi_h: if given (origins, normals), use the hemisphere
    reach test instead of the slab test (phase-A design)."""
    if d.ndim == 3:
        K = d.shape[0]
        o = np.broadcast_to(o[None], d.shape).reshape(-1, 3)
        d = d.reshape(-1, 3)
        del K
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    node, nt, nl, ntile, nlive = 0, 0, 0, 0, 0
    cand = []
    M = len(skip)
    while node < M:
        nt += 1
        bmn, bmx = nbox[node, :3], nbox[node, 3:]
        if hemi_h is not None:
            P, N = hemi_h
            h = np.maximum((bmn - P) * N, (bmx - P) * N).sum(-1)
            reach = (h > 0).any()
        else:
            t0 = (bmn[None] - o) * inv
            t1 = (bmx[None] - o) * inv
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            reach = ((tn <= tf) & (tf > 0)).any()
        leaf = count[node] > 0
        if reach and leaf:
            nl += 1
            cand.append(node)
            ntile += count[node]
            for k in range(count[node]):
                tb = tbox[first[node] + k]
                if hemi_h is not None:
                    P, N = hemi_h
                    h = np.maximum((tb[:3] - P) * N, (tb[3:] - P) * N).sum(-1)
                    if (h > 0).any():
                        nlive += 1
                else:
                    t0 = (tb[None, :3] - o) * inv
                    t1 = (tb[None, 3:] - o) * inv
                    tn = np.minimum(t0, t1).max(-1)
                    tf = np.maximum(t0, t1).min(-1)
                    if ((tn <= tf) & (tf > 0)).any():
                        nlive += 1
        node = node + 1 if (reach and not leaf) else skip[node]
    return nt, nl, ntile, nlive, cand


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sc = build(n)
    nbox = np.concatenate(
        [np.asarray(sc.node_bbmin), np.asarray(sc.node_bbmax)], -1
    )
    skip = np.asarray(sc.node_skip)
    first = np.asarray(sc.node_first)
    count = np.asarray(sc.node_count)
    # per-tile bboxes from the padded scene arrays (pads are degenerate
    # zeros at the origin -> mask by nonzero edge)
    v0 = np.asarray(sc.tri_v0)
    v1 = v0 + np.asarray(sc.tri_e1)
    v2 = v0 + np.asarray(sc.tri_e2)
    real = (np.abs(np.asarray(sc.tri_e1)).sum(-1) > 0)
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    lo[~real] = np.inf
    hi[~real] = -np.inf
    T = len(v0) // 128
    tbox = np.concatenate(
        [lo.reshape(T, 128, 3).min(1), hi.reshape(T, 128, 3).max(1)], -1
    )

    rng = np.random.default_rng(0)
    Pb, Nb = make_blocks(sc, nblocks, rng)
    tot = np.zeros(4)
    hemi = np.zeros(4)
    kbatch: dict = {}
    ncand_union = 0
    for b in range(nblocks):
        P, N = Pb[b], Nb[b]
        b0, b1, b2 = ortho(N)
        dirs = strat_dirs(b0, b1, b2, 8, 8, rng)
        Poff = P + N * 1e-3
        seen = set()
        for s in range(dirs.shape[0]):
            nt, nl, ntile, nlive, cand = walk(
                nbox, skip, first, count, tbox, Poff, dirs[s]
            )
            tot += (nt, nl, ntile, nlive)
            seen.update(cand)
        for K in (2, 4):
            kt = np.zeros(4)
            for s0 in range(0, dirs.shape[0], K):
                r = walk(
                    nbox, skip, first, count, tbox, Poff, dirs[s0 : s0 + K]
                )
                kt += r[:4]
            kbatch.setdefault(K, np.zeros(4))
            kbatch[K] += kt
        ht, hl, htile, hlive, _ = walk(
            nbox, skip, first, count, tbox, Poff, dirs[0],
            hemi_h=(Poff, N),
        )
        hemi += (ht, hl, htile, hlive)
        ncand_union += len(seen)
    S = 64
    print(f"n={n} nodes={len(skip)} tiles={T} blocks={nblocks}")
    print(
        "per (block,stratum) walk: nodes tested %.1f, leaves %.1f, "
        "tiles %.1f, tiles after per-tile cull %.1f (cull rate %.0f%%)"
        % (
            tot[0] / (nblocks * S),
            tot[1] / (nblocks * S),
            tot[2] / (nblocks * S),
            tot[3] / (nblocks * S),
            100 * (1 - tot[3] / max(tot[2], 1)),
        )
    )
    for K, kt in sorted(kbatch.items()):
        nw = nblocks * S / K
        print(
            "K=%d strata/walk: nodes tested %.1f (x%d dirs each), leaves "
            "%.1f, tiles %.1f, tile-culled %.1f (cull %.0f%%)"
            % (
                K,
                kt[0] / nw,
                K,
                kt[1] / nw,
                kt[2] / nw,
                kt[3] / nw,
                100 * (1 - kt[3] / max(kt[2], 1)),
            )
        )
    print(
        "per block hemisphere walk: nodes tested %.1f, cand leaves %.1f, "
        "cand tiles %.1f (tile-culled %.1f); union of stratum-visited "
        "leaves %.1f"
        % (
            hemi[0] / nblocks,
            hemi[1] / nblocks,
            hemi[2] / nblocks,
            hemi[3] / nblocks,
            ncand_union / nblocks,
        )
    )


if __name__ == "__main__":
    main()
