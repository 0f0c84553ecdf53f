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


def hungarian_match(cls_logits: jnp.ndarray,
                    bbox_preds: jnp.ndarray,
                    gt_codes: jnp.ndarray,
                    gt_labels: jnp.ndarray,
                    gt_mask: jnp.ndarray,
                    cls_weight: float = 2.0,
                    bbox_weight: float = 0.25) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match queries to padded GTs for one sample.

    Returns:
        matched_query: (max_gt,) int32 query index per GT (valid GTs).
        pos_mask: (num_query,) bool, True where a query is matched to a
            valid GT.
    """
    cost = focal_cost(cls_logits, gt_labels, weight=cls_weight) \
        + bbox_l1_cost(bbox_preds, gt_codes, weight=bbox_weight)
    cost = jnp.where(gt_mask[None, :], cost, _BIG)
    cost = jnp.nan_to_num(cost, nan=_BIG, posinf=_BIG, neginf=-_BIG)

    matched = _solve(jax.lax.stop_gradient(cost))

    matched = jnp.where(gt_mask, matched, -1)
    nq = cls_logits.shape[0]
    pos_mask = jnp.zeros((nq,), bool).at[
        jnp.where(matched >= 0, matched, nq)].set(True, mode='drop')
    return matched, pos_mask
