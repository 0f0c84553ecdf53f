"""Anchor3DHead: classification/regression/direction convs, losses and
box decoding.

Parity target: mmdet3d ``Anchor3DHead`` as configured by the reference
radar/lidar PointPillars configs
(``configs/PointPillars_NewScenes/pointpillars_4DRadar.py:55-115``):
4 classes x 2 rotations anchors on the 384-ch SECONDFPN map, 9-dim
DeltaXYZWLHR codes (velocity), sigmoid focal cls loss, smooth-L1 bbox
loss with sin-difference yaw encoding and code weights [1x7, 0.2, 0.2],
2-way direction classifier (CE, weight 0.2, dir_offset pi/4), rotated
NMS decoding (nms_pre=1000, score_thr=0.05, nms_thr=0.2, max=500).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.losses import (sigmoid_focal_loss, smooth_l1,
                                             softmax_cross_entropy)
from omnihd_scenes_tpu.models.target_assign import assign_targets
from omnihd_scenes_tpu.ops.boxes3d import decode_boxes, limit_period
from omnihd_scenes_tpu.ops.nms import multiclass_nms_rotated
from omnihd_scenes_tpu.ops.topk import blocked_top_k


class Anchor3DHead(nn.Module):
    """1x1 conv heads over the BEV feature map."""

    num_classes: int = 4
    num_anchors: int = 8         # sizes x rotations
    code_size: int = 9
    feat_channels: int = 384

    @nn.compact
    def __call__(self, x):
        # x: (H, W, C_in)
        cls_score = nn.Conv(self.num_anchors * self.num_classes, (1, 1))(x)
        bbox_pred = nn.Conv(self.num_anchors * self.code_size, (1, 1))(x)
        dir_pred = nn.Conv(self.num_anchors * 2, (1, 1))(x)
        return cls_score, bbox_pred, dir_pred


class HeadLossConfig(NamedTuple):
    num_classes: int = 4
    code_weights: Sequence[float] = (1.0,) * 7 + (0.2, 0.2)
    dir_offset: float = 0.7854
    pos_iou_thr: float = 0.6
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    cls_weight: float = 1.0
    bbox_weight: float = 1.0
    dir_weight: float = 0.2


def _add_sin_difference(pred_rot, target_rot):
    """sin(a - b) encoding: replaces the raw angle pair with
    (sin(a)cos(b), cos(a)sin(b)) so L1 on the difference equals
    L1 on sin(a-b) (mmdet3d ``add_sin_difference``)."""
    new_pred = jnp.sin(pred_rot) * jnp.cos(target_rot)
    new_target = jnp.cos(pred_rot) * jnp.sin(target_rot)
    return new_pred, new_target


def anchor_head_loss(cls_score: jnp.ndarray,
                     bbox_pred: jnp.ndarray,
                     dir_pred: jnp.ndarray,
                     anchors: jnp.ndarray,
                     gt_boxes: jnp.ndarray,
                     gt_labels: jnp.ndarray,
                     gt_mask: jnp.ndarray,
                     cfg: HeadLossConfig = HeadLossConfig()) -> Dict[str, jnp.ndarray]:
    """Single-sample anchor head loss; vmap over the batch.

    Shapes: cls_score (H, W, A*C), bbox_pred (H, W, A*9),
    dir_pred (H, W, A*2), anchors (H, W, A, 9), gt_* padded.
    """
    num_classes = cfg.num_classes
    flat_anchors = anchors.reshape(-1, anchors.shape[-1])
    a = flat_anchors.shape[0]

    cls_score = cls_score.reshape(a, num_classes)
    bbox_pred = bbox_pred.reshape(a, anchors.shape[-1])
    dir_pred = dir_pred.reshape(a, 2)

    tgt = assign_targets(flat_anchors, gt_boxes, gt_labels, gt_mask,
                         num_classes, cfg.pos_iou_thr, cfg.neg_iou_thr,
                         cfg.min_pos_iou, cfg.dir_offset)

    num_pos = jnp.clip(tgt.num_pos.astype(jnp.float32), 1.0, None)

    # Classification: one-hot with all-zeros background row.
    one_hot = jax.nn.one_hot(tgt.labels, num_classes + 1)[:, :num_classes]
    cls_loss = sigmoid_focal_loss(cls_score, one_hot)
    cls_loss = jnp.sum(cls_loss * tgt.label_weights[:, None]) / num_pos

    # Regression with sin-difference yaw.
    pred_rot, tgt_rot = _add_sin_difference(bbox_pred[:, 6],
                                            tgt.bbox_targets[:, 6])
    pred = bbox_pred.at[:, 6].set(pred_rot)
    target = tgt.bbox_targets.at[:, 6].set(tgt_rot)
    code_w = jnp.asarray(cfg.code_weights)
    reg_loss = smooth_l1(pred, target) * code_w
    reg_loss = jnp.sum(reg_loss * tgt.bbox_weights[:, None]) / num_pos

    # Direction classification on positive anchors.
    dir_loss = softmax_cross_entropy(dir_pred, tgt.dir_targets)
    dir_loss = jnp.sum(dir_loss * tgt.bbox_weights) / num_pos

    return {
        'loss_cls': cfg.cls_weight * cls_loss,
        'loss_bbox': cfg.bbox_weight * reg_loss,
        'loss_dir': cfg.dir_weight * dir_loss,
        'num_pos': tgt.num_pos,
    }


class DecodeCfg(NamedTuple):
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_thr: float = 0.2
    max_num: int = 500
    dir_offset: float = 0.7854
    dir_limit_offset: float = 0.0


def anchor_head_decode_candidates(cls_score: jnp.ndarray,
                                  bbox_pred: jnp.ndarray,
                                  dir_pred: jnp.ndarray,
                                  anchors: jnp.ndarray,
                                  cfg: DecodeCfg = DecodeCfg()):
    """Decode one sample's head outputs to the top ``nms_pre`` candidates.

    Returns (nms_pre, 9) boxes (yaw direction-folded) + (nms_pre, C)
    sigmoid scores — everything before the NMS.  This is also the
    device half of the pipelined serving decode: NMS over these
    candidates runs on the host (:mod:`omnihd_scenes_tpu.ops.nms_host`),
    overlapped with the next batch's device step.

    Performance notes (measured on TPU v5e, b4 production shape
    160x240x8 anchors x 4 classes):

    * Narrow row gathers are the decode's whole cost on TPU: pulling the
      top-1000 rows as four separate (A, 9/9/2/4) gathers measures
      ~7.2 ms, while ONE gather of 128+-lane-wide rows from the
      per-*cell* table measures ~0.3 ms.  All per-anchor columns are
      therefore concatenated into a single (cells, A_per_cell * 24)
      table, gathered once by cell index, and the in-cell anchor slot is
      selected with a tiny one-hot contraction.
    * ``sigmoid`` over the full (A, C) score table costs ~0.6 ms/sample;
      sigmoid is strictly monotone, so the top-k runs on
      ``sigmoid(max(logits))`` — bit-identical keys (and tie pattern) to
      ``max(sigmoid(logits))`` — and the per-class sigmoid is deferred
      to the 1000 selected rows.
    * Gathers from *unbatched* constants under vmap hit a slow lowered
      path on the axon backend: ``anchors`` is a per-sample
      (H, W, A, 9) operand — batch callers via ``vmap`` with anchors
      broadcast into the batch.  Top-k consumers sit behind an
      ``optimization_barrier`` so index arithmetic is not fused back
      into the sort.
    """
    code_size = anchors.shape[-1]
    aa = anchors.shape[-2]                       # anchors per cell
    cells = anchors.size // (aa * code_size)     # H*W
    a = cells * aa
    num_classes = cls_score.size // a

    logits = cls_score.reshape(cells, aa * num_classes)
    lmax = jnp.max(logits.reshape(cells, aa, num_classes), axis=-1)

    # Pre-NMS top-k on the per-anchor max class score (see note above:
    # sigmoid(max) == max(sigmoid) bitwise, by monotonicity).
    k = min(cfg.nms_pre, a)
    _, topk = blocked_top_k(jax.nn.sigmoid(lmax).reshape(-1), k)
    topk = jax.lax.optimization_barrier(topk)
    cell, slot = topk // aa, topk % aa

    table = jnp.concatenate([
        bbox_pred.reshape(cells, aa * code_size),
        anchors.reshape(cells, aa * code_size),
        dir_pred.reshape(cells, aa * 2),
        logits,
    ], axis=-1)
    rows = table[cell]                           # ONE wide-row gather

    sel = jax.nn.one_hot(slot, aa, dtype=rows.dtype)

    def pick(lo, width):
        block = rows[:, lo:lo + aa * width].reshape(k, aa, width)
        return jnp.einsum('ka,kaw->kw', sel, block)

    bb = pick(0, code_size)
    an = pick(aa * code_size, code_size)
    dp = pick(2 * aa * code_size, 2)
    lg = pick(2 * aa * code_size + 2 * aa, num_classes)

    boxes = decode_boxes(an, bb)
    scores = jax.nn.sigmoid(lg)
    dir_score = jnp.argmax(dp, axis=-1)

    # Fold the direction bin back into yaw.
    dir_rot = limit_period(boxes[:, 6] - cfg.dir_offset,
                           cfg.dir_limit_offset, jnp.pi)
    yaw = dir_rot + cfg.dir_offset + jnp.pi * dir_score.astype(boxes.dtype)
    boxes = boxes.at[:, 6].set(yaw)
    return boxes, scores


def anchor_head_get_bboxes(cls_score: jnp.ndarray,
                           bbox_pred: jnp.ndarray,
                           dir_pred: jnp.ndarray,
                           anchors: jnp.ndarray,
                           cfg: DecodeCfg = DecodeCfg()):
    """Decode one sample's head outputs into final boxes (in-graph NMS).

    Returns padded (max_num, 9) boxes + scores + labels + validity.
    """
    boxes, scores = anchor_head_decode_candidates(
        cls_score, bbox_pred, dir_pred, anchors, cfg)
    return multiclass_nms_rotated(boxes, scores, cfg.score_thr, cfg.nms_thr,
                                  cfg.max_num)
