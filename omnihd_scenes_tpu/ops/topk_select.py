"""Gather-free top-k row selection.

Dynamic gathers lower to a catastrophically slow path on this TPU
backend (~2.5 us/row), and wide variadic sorts hang the compiler.  This
module selects the top-k scoring rows of a payload matrix using only
reductions and one-hot contractions, which map straight onto the
VPU/MXU:

1. split the score vector into groups of 128 lanes; peel the top
   ``per_group`` entries of each group by repeated (argmax -> one-hot
   -> mask) — pure elementwise/reduction work;
2. exact ``top_k`` over the (a / 128) * per_group surviving candidates
   (small, fast);
3. pull the winners' payload rows with a one-hot matmul.

The result equals an exact top-k + gather unless more than
``per_group`` of the global top-k land in one 128-row group — the same
contract as ``jax.lax.approx_max_k``, and harmless for NMS
preselection, where such neighbours suppress each other anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

GROUP = 128


def _peel_group_topk(scores: jnp.ndarray, payload: jnp.ndarray,
                     per_group: int):
    """Top ``per_group`` rows of each 128-lane group.

    scores (g, 128), payload (g, 128, F) ->
    (g * per_group,) scores, (g * per_group, F) payload rows.
    """
    g = scores.shape[0]
    s = scores
    out_s, out_p = [], []
    for _ in range(per_group):
        m = jnp.max(s, axis=1)
        oh = (s == m[:, None])
        oh = oh & (jnp.cumsum(oh, axis=1) == 1)   # break ties: first hit
        ohf = oh.astype(payload.dtype)
        out_s.append(m)
        out_p.append(jnp.einsum('gk,gkf->gf', ohf, payload))
        s = jnp.where(oh, -jnp.inf, s)
    sel_s = jnp.stack(out_s, axis=1).reshape(g * per_group)
    sel_p = jnp.stack(out_p, axis=1).reshape(g * per_group, -1)
    return sel_s, sel_p


def topk_select(scores: jnp.ndarray, payload: jnp.ndarray, k: int,
                per_group: int = 8):
    """Select the k highest-scoring payload rows (single sample).

    Args:
        scores: (N,) float32, N % 128 == 0.
        payload: (N, F).
        k: number of rows to keep.
        per_group: candidates peeled per 128-lane group (exactness
            budget).

    Returns:
        (k,) selected scores (descending), (k, F) selected rows.
    """
    n, f = payload.shape
    assert n % GROUP == 0, n
    g = n // GROUP
    cand_s, cand_p = _peel_group_topk(scores.reshape(g, GROUP),
                                      payload.reshape(g, GROUP, f),
                                      per_group)
    top_s, top_idx = jax.lax.top_k(cand_s, k)
    top_idx = jax.lax.optimization_barrier(top_idx)
    # One-hot matmul instead of a gather.
    oh = (top_idx[:, None]
          == jax.lax.broadcasted_iota(jnp.int32, (k, cand_s.shape[0]), 1))
    top_p = jnp.dot(oh.astype(payload.dtype), cand_p,
                    preferred_element_type=jnp.float32)
    return top_s, top_p
