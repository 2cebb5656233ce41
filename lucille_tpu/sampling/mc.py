"""Monte-Carlo sampling helpers: Latin hypercube.

Equivalent capability to lucille's src/render/mc.c (`ri_mc_lhs`, mc.c:48):
N stratified samples per dimension with a random permutation decorrelating
the dimensions.  Implemented with `jax.random` so it is usable inside jit
and deterministic under a key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def latin_hypercube(key, n: int, dim: int) -> jnp.ndarray:
    """(n, dim) Latin-hypercube samples in [0,1)."""
    keys = jax.random.split(key, dim + 1)
    jitter = jax.random.uniform(keys[0], (n, dim))
    cols = []
    for d in range(dim):
        perm = jax.random.permutation(keys[d + 1], n)
        cols.append((perm + jitter[:, d]) / n)
    return jnp.stack(cols, axis=-1)
