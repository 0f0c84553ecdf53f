"""Chamfer distance (occupancy reconstruction eval helper).

Parity target: the chamfer CUDA extension referenced (and commented
out) by ``datasets/evaluation_metrics.py:3,32`` — a plain pairwise-min
jnp implementation, chunked so big clouds don't materialize an N x M
matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray,
                     chunk: int = 4096):
    """Symmetric chamfer distance between (N, 3) and (M, 3) clouds.

    Returns (mean_a_to_b, mean_b_to_a) of squared distances.
    """

    def min_dists(x, y):
        def one_chunk(xc):
            d = jnp.sum((xc[:, None, :] - y[None, :, :]) ** 2, axis=-1)
            return jnp.min(d, axis=1)

        n = x.shape[0]
        pad = (-n) % chunk
        xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        out = jax.lax.map(one_chunk, xp.reshape(-1, chunk, x.shape[1]))
        return out.reshape(-1)[:n]

    return jnp.mean(min_dists(a, b)), jnp.mean(min_dists(b, a))
