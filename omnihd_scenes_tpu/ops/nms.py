"""Rotated NMS and box post-processing (TPU-native, static shapes).

Replaces the mmcv rotated-NMS CUDA kernel used by the reference's
``Anchor3DHead.get_bboxes`` path (``test_cfg: use_rotate_nms=True,
nms_pre=1000, nms_thr=0.2, score_thr=0.05, max_num=500``).  Greedy NMS
runs as a ``lax.fori_loop`` over a fixed candidate count with a
precomputed pairwise rotated-IoU matrix — O(N^2) vectorized work that
XLA maps well onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.ops.boxes3d import rotated_iou_bev


def nms_rotated(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float,
                valid: jnp.ndarray = None) -> jnp.ndarray:
    """Greedy rotated-BEV NMS.

    Args:
        boxes: (N, >=7) boxes sorted or unsorted.
        scores: (N,) confidence scores; invalid entries should be -inf.
        iou_threshold: suppression threshold.
        valid: optional (N,) mask of candidate validity.

    Returns:
        keep: (N,) bool mask of surviving boxes.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    valid_s = valid[order]

    iou = rotated_iou_bev(boxes_s, boxes_s)

    def body(i, alive):
        cur_alive = alive[i] & valid_s[i]
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & cur_alive
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, n, body, valid_s)

    keep = jnp.zeros((n,), dtype=bool).at[order].set(alive)
    return keep & valid


def multiclass_nms_rotated(boxes: jnp.ndarray,
                           scores: jnp.ndarray,
                           score_thr: float,
                           iou_threshold: float,
                           max_num: int):
    """Per-class rotated NMS over a (N, num_classes) score matrix.

    Matches mmdet3d ``box3d_multiclass_nms`` semantics (class-wise NMS,
    concatenated, top ``max_num`` by score).  Returns fixed-size padded
    outputs: (max_num, D) boxes, (max_num,) scores/labels, and a bool
    validity mask.
    """
    n, num_classes = scores.shape

    all_scores, all_labels, all_keep = [], [], []
    for cls in range(num_classes):  # static unroll (num_classes = 4)
        cls_scores = scores[:, cls]
        cand = cls_scores > score_thr
        keep = nms_rotated(boxes, cls_scores, iou_threshold, valid=cand)
        all_scores.append(jnp.where(keep, cls_scores, -jnp.inf))
        all_labels.append(jnp.full((n,), cls, dtype=jnp.int32))
        all_keep.append(keep)

    flat_scores = jnp.concatenate(all_scores)        # (N * C,)
    flat_labels = jnp.concatenate(all_labels)
    flat_keep = jnp.concatenate(all_keep)

    k = min(max_num, n * num_classes)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    box_idx = top_idx % n
    out_boxes = boxes[box_idx]
    out_labels = flat_labels[top_idx]
    out_valid = flat_keep[top_idx] & (top_scores > -jnp.inf)
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    if k < max_num:  # pad to the static output size
        pad = max_num - k
        out_boxes = jnp.concatenate(
            [out_boxes, jnp.zeros((pad, boxes.shape[-1]), boxes.dtype)])
        out_scores = jnp.concatenate([out_scores, jnp.zeros((pad,))])
        out_labels = jnp.concatenate(
            [out_labels, jnp.zeros((pad,), jnp.int32)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((pad,), bool)])
    return out_boxes, out_scores, out_labels, out_valid
