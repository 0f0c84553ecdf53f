"""Hungarian matching for the DETR head (host scipy via pure_callback).

Parity target: ``HungarianAssigner3D`` + cost terms
(reference ``core/bbox/assigners/hungarian_assigner_3d.py:17-139``,
``core/bbox/match_costs/match_cost.py``): cost = FocalLossCost(w=2.0)
on sigmoid class probabilities + BBox3DL1Cost(w=0.25) on the first 8
dims of the normalized code, solved with scipy
``linear_sum_assignment`` — a host round-trip in the reference too
(SURVEY.md call stack 3.2 "scipy, CPU <- host sync").

The padded-GT formulation keeps shapes static: invalid GT columns carry
a huge cost so they are only matched when queries outnumber real GTs,
and those assignments are masked out afterwards.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e8


def focal_cost(cls_logits: jnp.ndarray, gt_labels: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0,
               eps: float = 1e-12, weight: float = 2.0) -> jnp.ndarray:
    """(num_query, num_gt) classification cost (mmdet FocalLossCost)."""
    p = jax.nn.sigmoid(cls_logits)                       # (nq, C)
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * (p ** gamma)
    pos_cost = -jnp.log(p + eps) * alpha * ((1 - p) ** gamma)
    cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]
    return cost * weight


def bbox_l1_cost(bbox_preds: jnp.ndarray, gt_codes: jnp.ndarray,
                 weight: float = 0.25) -> jnp.ndarray:
    """(num_query, num_gt) L1 cost on the first 8 normalized dims."""
    diff = jnp.abs(bbox_preds[:, None, :8] - gt_codes[None, :, :8])
    return diff.sum(-1) * weight


def _solve_host(cost: np.ndarray) -> np.ndarray:
    """Host-side assignment: returns per-GT matched query index."""
    from scipy.optimize import linear_sum_assignment

    nq, ng = cost.shape
    row, col = linear_sum_assignment(cost)
    out = np.full((ng,), -1, np.int32)
    out[col] = row.astype(np.int32)
    return out


@jax.custom_jvp
def _solve(cost: jnp.ndarray) -> jnp.ndarray:
    return jax.pure_callback(
        _solve_host,
        jax.ShapeDtypeStruct((cost.shape[1],), jnp.int32),
        cost, vmap_method='sequential')


@_solve.defjvp
def _solve_jvp(primals, tangents):
    # The assignment is piecewise constant in the costs: zero tangent
    # (int32 output => float0), which lets the matcher sit inside a
    # differentiated loss (pure_callback alone rejects JVP).
    out = _solve(primals[0])
    zero = jnp.zeros(out.shape, dtype=jax.dtypes.float0)
    return out, zero


def _solve_auction(cost: jnp.ndarray, valid: jnp.ndarray = None,
                   eps: float = 1e-3,
                   max_iters: int = 512) -> jnp.ndarray:
    """Jittable assignment via Bertsekas' auction algorithm.

    Fully in-graph (lax.while_loop + dense (ng, nq) updates — no
    scatter, no host callback), which matters on TPU runtimes without
    host-callback support where :func:`_solve`'s ``pure_callback``
    cannot run.  eps-optimal: total cost within ``ng * eps`` of the
    Hungarian optimum — training-equivalent for DETR matching.

    Args:
        cost: (num_query, num_gt) float32, num_gt <= num_query.
        valid: (num_gt,) bool — padded GTs (False) do not bid and are
            never required for termination.  Their downstream
            assignments are masked anyway, and letting them bid
            livelocks: their uniform ~1e8 costs swallow the eps price
            increments in float32, so they contest the same query
            forever and burn max_iters every call.

    Returns:
        (num_gt,) int32 matched query per GT (distinct for valid GTs;
        -1 for padded GTs or if the iteration cap is hit, which masks
        that GT's loss downstream).
    """
    nq, ng = cost.shape
    if valid is None:
        valid = jnp.ones((ng,), bool)
    # GTs bid for queries: value[g, q] = -cost (maximization form).
    value = -cost.T
    # Deterministic micro-tilt breaks exact ties between real rows.
    g_ids = jnp.arange(ng, dtype=jnp.int32)[:, None]
    q_ids = jnp.arange(nq, dtype=jnp.int32)[None, :]
    value = value + 1e-6 * ((g_ids * 31 + q_ids * 17) % 64).astype(
        value.dtype)
    n_need = valid.sum()

    def cond(state):
        owner, prices, it = state
        # A GT owns at most one query, so owned-query count equals
        # assigned-GT count.
        return (it < max_iters) & ((owner >= 0).sum() < n_need)

    def body(state):
        owner, prices, it = state
        # assigned[g] = True iff some query is owned by g.
        assigned = jnp.zeros((ng,), bool).at[
            jnp.where(owner >= 0, owner, ng)].set(True, mode='drop')
        net = value - prices[None, :]                    # (ng, nq)
        top2 = jax.lax.top_k(net, 2)[0]
        best_q = jnp.argmax(net, axis=1)                 # (ng,)
        bid = top2[:, 0] - top2[:, 1] + eps
        bidding = ~assigned & valid
        # Dense per-query bid matrix (ng x nq is small).
        bids = jnp.where(
            bidding[:, None] & (best_q[:, None] == q_ids),
            bid[:, None], -jnp.inf)
        col_best = bids.max(axis=0)                      # (nq,)
        has_bid = jnp.isfinite(col_best)
        winner = jnp.argmax(bids, axis=0).astype(jnp.int32)
        new_owner = jnp.where(has_bid, winner, owner)
        new_prices = jnp.where(has_bid, prices + col_best, prices)
        return new_owner, new_prices, it + 1

    owner0 = jnp.full((nq,), -1, jnp.int32)
    prices0 = jnp.zeros((nq,), cost.dtype)
    owner, _, _ = jax.lax.while_loop(cond, body,
                                     (owner0, prices0, jnp.int32(0)))
    # assigned[g] = owned query index (or -1).
    matched = jnp.full((ng,), -1, jnp.int32).at[
        jnp.where(owner >= 0, owner, ng)].set(
            jnp.arange(nq, dtype=jnp.int32), mode='drop')
    return jax.lax.stop_gradient(matched)


def hungarian_match(cls_logits: jnp.ndarray,
                    bbox_preds: jnp.ndarray,
                    gt_codes: jnp.ndarray,
                    gt_labels: jnp.ndarray,
                    gt_mask: jnp.ndarray,
                    cls_weight: float = 2.0,
                    bbox_weight: float = 0.25,
                    solver: str = 'auto') -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match queries to padded GTs for one sample.

    ``solver``: 'scipy' (host callback, exact — the reference's path),
    'auction' (in-graph eps-optimal), or 'auto' — scipy where host
    callbacks exist, auction on TPU runtimes without them (the axon
    relay rejects pure_callback).

    Returns:
        matched_query: (max_gt,) int32 query index per GT (valid GTs).
        pos_mask: (num_query,) bool, True where a query is matched to a
            valid GT.
    """
    cost = focal_cost(cls_logits, gt_labels, weight=cls_weight) \
        + bbox_l1_cost(bbox_preds, gt_codes, weight=bbox_weight)
    cost = jnp.where(gt_mask[None, :], cost, _BIG)
    cost = jnp.nan_to_num(cost, nan=_BIG, posinf=_BIG, neginf=-_BIG)

    if solver == 'auto':
        solver = 'scipy' if jax.default_backend() == 'cpu' else 'auction'
    if solver == 'auction':
        matched = _solve_auction(jax.lax.stop_gradient(cost), gt_mask)
    else:
        matched = _solve(jax.lax.stop_gradient(cost))

    matched = jnp.where(gt_mask, matched, -1)
    nq = cls_logits.shape[0]
    pos_mask = jnp.zeros((nq,), bool).at[
        jnp.where(matched >= 0, matched, nq)].set(True, mode='drop')
    return matched, pos_mask
