"""Exact blocked top-k for large 1-D score tables on TPU.

XLA's ``lax.top_k`` over a 307k-row table (the anchor head's
pre-NMS candidate selection, reference semantics
``mmdet3d/models/dense_heads/anchor3d_head.py`` ``nms_pre``) lowers to
one monolithic sort-based TopK and measures 1.16 ms/sample at the
production shape (b4, 160x240x8 anchors).  Splitting the table into
``num_blocks`` contiguous slices, taking a *batched* per-block top-k,
and merging with one small final top-k measures 0.52 ms/sample
(nb=16; nb=8/32 within 7% — BENCH.md round 3).  The batched small
sorts tile onto the VPU far better than one giant sort network.

Exactness (values AND indices), not approximate:

* every element of the global top-k lies in its own block's top-k
  (at most k elements of any block can be in the global top-k), so the
  ``num_blocks * k`` merge candidates are a superset of the answer;
* ``lax.top_k`` breaks ties by lower index.  Within a block that is the
  global order restricted to the block; across blocks the merge's
  stable tie-break follows block-major candidate order, and blocks are
  *contiguous* slices, so tied values again win lowest-global-index
  first — bit-identical to single-shot ``lax.top_k`` on the full table.

``jax.lax.approx_max_k`` (recall 0.95) measures 0.27 ms but changes
the candidate *set*; the blocked form keeps reference semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['blocked_top_k']


def blocked_top_k(x: jnp.ndarray, k: int, num_blocks: int = 16):
    """Exact drop-in for ``jax.lax.top_k(x, k)`` on a 1-D array.

    Returns ``(values, indices)`` bit-identical to ``lax.top_k``
    (including tie order; see module docstring).  Falls back to the
    single-shot form when the table is small relative to ``k`` or not
    evenly divisible: the win only exists when ``num_blocks * k`` is
    well under ``x.size``.
    """
    n = x.shape[-1]
    if x.ndim != 1:
        raise ValueError(f'blocked_top_k expects 1-D input, got {x.shape}')
    if (k >= n or n % num_blocks or num_blocks * k * 2 >= n):
        return jax.lax.top_k(x, min(k, n))
    blk = x.reshape(num_blocks, n // num_blocks)
    v, i = jax.lax.top_k(blk, k)                     # batched small sorts
    base = (jnp.arange(num_blocks, dtype=i.dtype) * (n // num_blocks))
    flat_i = (i + base[:, None]).reshape(num_blocks * k)
    flat_v = v.reshape(num_blocks * k)
    v2, sel = jax.lax.top_k(flat_v, k)
    return v2, flat_i[sel]
