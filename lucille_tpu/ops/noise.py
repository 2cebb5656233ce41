"""Perlin-style gradient noise for procedural shaders.

Capability-equivalent of src/render/noise.c (classic Perlin noise used by
the RSL ``noise()`` builtin).  Fresh implementation of Perlin's improved
noise (2002): permutation-table hashing, quintic fade, gradient dot
products — all as vectorized jnp ops so noise() traces inside shaders.
"""

from __future__ import annotations

import numpy as np

# deterministic permutation table (Perlin's reference table)
_P = np.array(
    [151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
     140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
     247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
     57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
     74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
     60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
     65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
     200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
     52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
     207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
     119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
     129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
     218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
     81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
     184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
     222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180],
    dtype=np.int32,
)
_PERM = np.concatenate([_P, _P])


def perlin3(p):
    """Improved Perlin noise at points p (..., 3).  Output in [0, 1]
    (the RSL noise() convention), jit-compatible."""
    import jax.numpy as jnp

    perm = jnp.asarray(_PERM)
    pi = jnp.floor(p).astype(jnp.int32) & 255
    pf = p - jnp.floor(p)

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u, v, w = fade(pf[..., 0]), fade(pf[..., 1]), fade(pf[..., 2])

    def grad(h, x, y, z):
        h = h & 15
        uu = jnp.where(h < 8, x, y)
        vv = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
        return jnp.where(h & 1 == 0, uu, -uu) + jnp.where(h & 2 == 0, vv, -vv)

    X, Y, Z = pi[..., 0], pi[..., 1], pi[..., 2]
    x, y, z = pf[..., 0], pf[..., 1], pf[..., 2]

    A = perm[X] + Y
    AA = perm[A] + Z
    AB = perm[A + 1] + Z
    B = perm[X + 1] + Y
    BA = perm[B] + Z
    BB = perm[B + 1] + Z

    def lerp(t, a, b):
        return a + t * (b - a)

    n = lerp(
        w,
        lerp(
            v,
            lerp(u, grad(perm[AA], x, y, z), grad(perm[BA], x - 1, y, z)),
            lerp(u, grad(perm[AB], x, y - 1, z), grad(perm[BB], x - 1, y - 1, z)),
        ),
        lerp(
            v,
            lerp(
                u,
                grad(perm[AA + 1], x, y, z - 1),
                grad(perm[BA + 1], x - 1, y, z - 1),
            ),
            lerp(
                u,
                grad(perm[AB + 1], x, y - 1, z - 1),
                grad(perm[BB + 1], x - 1, y - 1, z - 1),
            ),
        ),
    )
    return 0.5 * (n + 1.0)


def turbulence3(p, octaves: int = 4):
    """Sum of |noise| octaves (procedural shader helper)."""
    import jax.numpy as jnp

    total = jnp.zeros(p.shape[:-1], p.dtype)
    amp = 1.0
    freq = 1.0
    for _ in range(octaves):
        total = total + amp * jnp.abs(perlin3(p * freq) * 2.0 - 1.0)
        amp *= 0.5
        freq *= 2.0
    return total
