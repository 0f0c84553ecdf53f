"""Max-IoU anchor-target assignment (jit, static shapes).

Parity target: mmdet ``MaxIoUAssigner`` with
``BboxOverlapsNearest3D`` as wired by the reference
(``configs/PointPillars_NewScenes/pointpillars_4DRadar.py:94-106``):
pos_iou_thr=0.6, neg_iou_thr=0.3, min_pos_iou=0.3, plus the
"every GT claims its best anchor" rule.  GT boxes arrive as padded
(max_gt, 9) arrays with a validity mask; invalid rows never match.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from omnihd_scenes_tpu.ops.boxes3d import (bbox_overlaps_nearest_3d,
                                           encode_boxes)


class AnchorTargets(NamedTuple):
    """Per-anchor training targets (all shapes (A,) or (A, 9))."""

    labels: jnp.ndarray        # int32 class id; num_classes = background
    label_weights: jnp.ndarray  # 1 for pos+neg, 0 for ignored
    bbox_targets: jnp.ndarray  # encoded deltas (A, 9)
    bbox_weights: jnp.ndarray  # 1 for pos anchors
    dir_targets: jnp.ndarray   # int32 direction bin (0/1)
    num_pos: jnp.ndarray       # scalar


def assign_targets(anchors: jnp.ndarray,
                   gt_boxes: jnp.ndarray,
                   gt_labels: jnp.ndarray,
                   gt_mask: jnp.ndarray,
                   num_classes: int,
                   pos_iou_thr: float = 0.6,
                   neg_iou_thr: float = 0.3,
                   min_pos_iou: float = 0.3,
                   dir_offset: float = 0.7854) -> AnchorTargets:
    """Assign padded GT boxes to a flat anchor set.

    Args:
        anchors: (A, 9) flattened anchors.
        gt_boxes: (G, 9) padded GT boxes.
        gt_labels: (G,) int labels.
        gt_mask: (G,) bool validity.
    """
    a = anchors.shape[0]
    g = gt_boxes.shape[0]

    iou = bbox_overlaps_nearest_3d(gt_boxes, anchors)          # (G, A)
    iou = jnp.where(gt_mask[:, None], iou, -1.0)

    anchor_max = jnp.max(iou, axis=0)                          # (A,)
    anchor_arg = jnp.argmax(iou, axis=0)

    # Base rule: pos if >= pos_thr, neg (background) if < neg_thr,
    # in-between ignored.
    POS, NEG, IGN = 0, 1, 2
    state = jnp.where(anchor_max >= pos_iou_thr, POS,
                      jnp.where(anchor_max < neg_iou_thr, NEG, IGN))

    # GT-forcing: each valid GT claims the anchors that achieve its max
    # IoU (if >= min_pos_iou).  Later GTs overwrite earlier ones, like
    # the reference's sequential loop.
    gt_max = jnp.max(iou, axis=1)                              # (G,)
    claims = (iou == gt_max[:, None]) & (gt_max[:, None] >= min_pos_iou) \
        & gt_mask[:, None]                                      # (G, A)
    claimed = jnp.any(claims, axis=0)
    # Last claiming GT wins.
    claim_gt = jnp.argmax(
        jnp.where(claims, jnp.arange(g)[:, None], -1), axis=0)

    assigned_gt = jnp.where(claimed, claim_gt,
                            jnp.where(state == POS, anchor_arg, 0))
    is_pos = claimed | (state == POS)
    is_neg = (state == NEG) & ~claimed
    # mmdet convention: ignored anchors get zero label weight.
    label_weights = (is_pos | is_neg).astype(jnp.float32)

    labels = jnp.where(is_pos, gt_labels[assigned_gt], num_classes)
    labels = labels.astype(jnp.int32)

    matched = gt_boxes[assigned_gt]                            # (A, 9)
    bbox_targets = encode_boxes(anchors, matched)
    bbox_targets = jnp.where(is_pos[:, None], bbox_targets, 0.0)
    bbox_weights = is_pos.astype(jnp.float32)

    # Direction bin: floor((gt_yaw - dir_offset) / pi) mod 2.
    rot = matched[..., 6] - dir_offset
    dir_targets = (jnp.floor(rot / jnp.pi).astype(jnp.int32) % 2)
    dir_targets = jnp.where(is_pos, dir_targets, 0).astype(jnp.int32)

    return AnchorTargets(labels=labels,
                         label_weights=label_weights,
                         bbox_targets=bbox_targets,
                         bbox_weights=bbox_weights,
                         dir_targets=dir_targets,
                         num_pos=jnp.sum(is_pos.astype(jnp.int32)))
