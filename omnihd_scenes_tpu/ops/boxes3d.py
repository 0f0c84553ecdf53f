"""3D box array ops in JAX (LiDAR-frame convention).

Box layout everywhere in the model stack:
``[x, y, z_bottom, w(x_size), l(y_size), h(z_size), yaw, (vx, vy)]``
— mmdet3d's ``LiDARInstance3DBoxes`` convention that the reference
pipeline uses (``newscenes_dataset.py:get_ann_info`` constructs boxes
with ``origin=(0.5,0.5,0.5)`` then converts to bottom-center).

Implements the geometry the reference delegates to mmdet3d CUDA/torch
ops: nearest-BEV IoU (``BboxOverlapsNearest3D``, used by
``MaxIoUAssigner``), exact rotated BEV IoU (used by rotated NMS), and
the ``DeltaXYZWLHRBBoxCoder`` encode/decode with 9-dim codes.
All functions are jit-compatible with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gravity_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) gravity centers of bottom-centered boxes."""
    return jnp.stack([boxes[..., 0], boxes[..., 1],
                      boxes[..., 2] + boxes[..., 5] * 0.5], axis=-1)


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angle into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# Nearest-BEV (axis-aligned) IoU — the assigner metric
# ---------------------------------------------------------------------------

def nearest_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV boxes -> nearest axis-aligned (x1, y1, x2, y2).

    Swaps the xy extents when the yaw is closer to +-pi/2 (mmdet3d
    ``nearest_bev`` semantics).
    """
    rot = limit_period(boxes[..., 6], 0.5, np.pi)
    swap = jnp.abs(rot) > np.pi / 4
    dx = jnp.where(swap, boxes[..., 4], boxes[..., 3])
    dy = jnp.where(swap, boxes[..., 3], boxes[..., 4])
    cx, cy = boxes[..., 0], boxes[..., 1]
    return jnp.stack([cx - dx / 2, cy - dy / 2, cx + dx / 2, cy + dy / 2],
                     axis=-1)


def iou_2d(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
           eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise IoU of axis-aligned (x1,y1,x2,y2) boxes: (N, M)."""
    area1 = ((boxes1[:, 2] - boxes1[:, 0])
             * (boxes1[:, 3] - boxes1[:, 1]))[:, None]
    area2 = ((boxes2[:, 2] - boxes2[:, 0])
             * (boxes2[:, 3] - boxes2[:, 1]))[None, :]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.clip(area1 + area2 - inter, eps, None)


def bbox_overlaps_nearest_3d(boxes1: jnp.ndarray,
                             boxes2: jnp.ndarray) -> jnp.ndarray:
    """Nearest-BEV IoU matrix (N, M) for 7+-dim boxes."""
    return iou_2d(nearest_bev(boxes1), nearest_bev(boxes2))


# ---------------------------------------------------------------------------
# Exact rotated BEV IoU — the NMS metric
# ---------------------------------------------------------------------------

def bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4, 2) BEV polygon corners (counter-clockwise)."""
    cx, cy = boxes[..., 0], boxes[..., 1]
    hw, hl = boxes[..., 3] * 0.5, boxes[..., 4] * 0.5
    yaw = boxes[..., 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # Local corners (x along x_size=w, y along y_size=l), CCW order.
    lx = jnp.stack([hw, -hw, -hw, hw], axis=-1)
    ly = jnp.stack([hl, hl, -hl, -hl], axis=-1)
    gx = cx[..., None] + lx * cos[..., None] - ly * sin[..., None]
    gy = cy[..., None] + lx * sin[..., None] + ly * cos[..., None]
    return jnp.stack([gx, gy], axis=-1)


def _edge_clip_cross(p0: jnp.ndarray, r: jnp.ndarray, boxes: jnp.ndarray,
                     eps_in: float = 1e-5, eps_b: float = 1e-5,
                     eps_par: float = 1e-6) -> jnp.ndarray:
    """Green's-theorem boundary contribution of directed edges clipped
    to rotated boxes.

    ``p0``/``r``: (..., 2) edge start and direction (point = p0 + t*r,
    t in [0, 1]).  ``boxes``: (..., 7+) clipping boxes, broadcast
    against the edge axes.  Returns cross(pa, pb) per edge, where
    [pa, pb] is the sub-segment inside the box; pieces that lie ON the
    box boundary (within ``eps_b``) are weighted 1/2 so that coincident
    boundaries are counted exactly once across the two clip passes
    (same-side coincidence) or cancel (external touch).
    """
    cx, cy, yaw = boxes[..., 0], boxes[..., 1], boxes[..., 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    dx, dy = p0[..., 0] - cx, p0[..., 1] - cy
    # Edge start / direction in the clipping box's local frame.
    al = jnp.stack([cos * dx + sin * dy, -sin * dx + cos * dy], -1)
    rl = jnp.stack([cos * r[..., 0] + sin * r[..., 1],
                    -sin * r[..., 0] + cos * r[..., 1]], -1)
    h = jnp.stack([boxes[..., 3], boxes[..., 4]], -1) * 0.5

    # Per-axis slab interval |al + t*rl| <= h (+eps).  The parallel
    # threshold must be relative to the coordinate scale: an edge of a
    # box tested against an identical box has local direction exactly
    # (len, 0) up to float residue ~ulp(|corner|) — corners sit tens of
    # meters from the origin, so the residue (~|c|*2^-23) overshoots an
    # absolute 1e-6 — and misclassifying it breaks the 1/2-weighted
    # boundary telescoping, returning IoU 0 for exact duplicates.
    scale = (1.0 + jnp.abs(p0[..., 0]) + jnp.abs(p0[..., 1])
             + jnp.abs(r[..., 0]) + jnp.abs(r[..., 1]))[..., None]
    parallel = jnp.abs(rl) < eps_par * scale
    safe_rl = jnp.where(parallel, 1.0, rl)
    ta = (-h - eps_in - al) / safe_rl
    tb = (h + eps_in - al) / safe_rl
    inside = jnp.abs(al) <= h + eps_in
    big = jnp.asarray(1e30, al.dtype)
    tmin = jnp.where(parallel, jnp.where(inside, -big, big),
                     jnp.minimum(ta, tb))
    tmax = jnp.where(parallel, jnp.where(inside, big, -big),
                     jnp.maximum(ta, tb))
    t0 = jnp.maximum(jnp.max(tmin, axis=-1), 0.0)
    t1 = jnp.minimum(jnp.min(tmax, axis=-1), 1.0)
    empty = t1 < t0
    t0 = jnp.where(empty, 0.0, t0)
    t1 = jnp.where(empty, 0.0, t1)          # pa == pb -> zero cross

    pa = p0 + t0[..., None] * r
    pb = p0 + t1[..., None] * r
    on_boundary = jnp.any(parallel & (jnp.abs(jnp.abs(al) - h) <= eps_b),
                          axis=-1)
    w = jnp.where(on_boundary, 0.5, 1.0)
    return w * (pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0])


def rotated_intersection_bev(boxes1: jnp.ndarray,
                             boxes2: jnp.ndarray) -> jnp.ndarray:
    """Exact pairwise rotated BEV intersection areas (N, M).

    Green's-theorem formulation (A = 1/2 ∮ x dy − y dx): the boundary
    of the convex intersection consists of the pieces of each box's
    (CCW) edges lying inside the other box, and the line integral
    decomposes over directed segments independent of traversal order —
    so no vertex collection, angle sorting, or ``arctan2`` is needed.
    Each of the 8 edges is clipped to the other box's two local-frame
    slabs (4 half-planes) and contributes ``cross(pa, pb)/2``.
    Replaces the mmcv/mmdet3d rotated-IoU CUDA kernel; ~10x cheaper on
    the VPU than polygon-vertex sorting.
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    c1 = bev_corners(boxes1)                                  # (N, 4, 2)
    c2 = bev_corners(boxes2)
    r1 = c1[:, [1, 2, 3, 0], :] - c1                          # CCW edges
    r2 = c2[:, [1, 2, 3, 0], :] - c2

    # Edges of box1 clipped by box2: broadcast (N, M, 4, ...).
    s1 = _edge_clip_cross(c1[:, None], r1[:, None],
                          boxes2[None, :, None, :])
    s2 = _edge_clip_cross(c2[None, :], r2[None, :],
                          boxes1[:, None, None, :])
    inter = 0.5 * (jnp.sum(s1, axis=-1) + jnp.sum(s2, axis=-1))

    area1 = (boxes1[:, 3] * boxes1[:, 4])[:, None]
    area2 = (boxes2[:, 3] * boxes2[:, 4])[None, :]
    return jnp.clip(inter, 0.0, jnp.minimum(area1, area2))


def rotated_iou_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                    eps: float = 1e-6) -> jnp.ndarray:
    """Exact pairwise rotated BEV IoU (N, M)."""
    inter = rotated_intersection_bev(boxes1, boxes2)
    area1 = (boxes1[:, 3] * boxes1[:, 4])[:, None]
    area2 = (boxes2[:, 3] * boxes2[:, 4])[None, :]
    return inter / jnp.clip(area1 + area2 - inter, eps, None)


# ---------------------------------------------------------------------------
# DeltaXYZWLHR box coder (code_size 9)
# ---------------------------------------------------------------------------

def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Anchor-relative regression targets (mmdet3d DeltaXYZWLHRBBoxCoder).

    anchors/gt: (..., 9) = [x, y, z, w, l, h, r, vx, vy].
    """
    xa, ya, za, wa, la, ha, ra, vxa, vya = jnp.split(anchors, 9, axis=-1)
    xg, yg, zg, wg, lg, hg, rg, vxg, vyg = jnp.split(gt, 9, axis=-1)
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    wt = jnp.log(wg / wa)
    lt = jnp.log(lg / la)
    ht = jnp.log(hg / ha)
    rt = rg - ra
    vxt = (vxg - vxa) / diag
    vyt = (vyg - vya) / diag
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt, vxt, vyt], axis=-1)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`."""
    xa, ya, za, wa, la, ha, ra, vxa, vya = jnp.split(anchors, 9, axis=-1)
    xt, yt, zt, wt, lt, ht, rt, vxt, vyt = jnp.split(deltas, 9, axis=-1)
    za = za + ha / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    wg = jnp.exp(wt) * wa
    lg = jnp.exp(lt) * la
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    vxg = vxt * diag + vxa
    vyg = vyt * diag + vya
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg, vxg, vyg], axis=-1)
