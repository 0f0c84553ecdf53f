"""Host-side greedy rotated NMS (the serving-pipeline decode half).

The reference runs NMS on the GPU inside the forward
(``mmdet3d box3d_multiclass_nms``, reference ``Anchor3DHead.get_bboxes``
``test_cfg: use_rotate_nms=True``); the in-graph TPU equivalent is
:func:`omnihd_scenes_tpu.ops.nms.multiclass_nms_rotated`.  That path
costs ~2.5 ms/sample of top-k/sort/polygon work a systolic array is bad
at (BENCH.md component profile).  In a streaming server the device does
not have to wait for it: the jitted graph ends at the top-``nms_pre``
candidate decode (:func:`..models.anchor_head.anchor_head_decode_candidates`),
the ~60 KB candidate tensors are copied back, and the O(N^2) suppression
runs here on the scalar core — overlapped with the next batch's device
step, because JAX dispatch is asynchronous.

Semantics are identical to the in-graph path (greedy per class by
descending score, rotated-BEV IoU > thr suppression, survivors merged in
flat class-major top-k order, top ``max_num``); equality is pinned by
``tests/test_nms_host.py``, with disagreement allowed only for box pairs
whose IoU lies within float tolerance of the threshold.  The native C++
core (``csrc/host_ops.cpp:nms_rotated_multiclass``) releases the GIL via
ctypes; a pure-NumPy fallback keeps the op available without a compiler.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from omnihd_scenes_tpu.data.native import get_lib


def _rotated_iou_np(b1: np.ndarray, b2: np.ndarray) -> float:
    """Exact rotated-BEV IoU of two boxes (NumPy fallback path)."""
    a1 = float(b1[3]) * float(b1[4])
    a2 = float(b2[3]) * float(b2[4])
    if a1 <= 0 or a2 <= 0:
        return 0.0
    dx, dy = float(b1[0] - b2[0]), float(b1[1] - b2[1])
    r1 = 0.5 * float(np.hypot(b1[3], b1[4]))
    r2 = 0.5 * float(np.hypot(b2[3], b2[4]))
    if dx * dx + dy * dy > (r1 + r2) ** 2:
        return 0.0

    c, s = np.cos(float(b1[6])), np.sin(float(b1[6]))
    hw, hl = 0.5 * float(b1[3]), 0.5 * float(b1[4])
    lx = np.array([hw, -hw, -hw, hw])
    ly = np.array([hl, hl, -hl, -hl])
    poly = np.stack([b1[0] + lx * c - ly * s,
                     b1[1] + lx * s + ly * c], axis=-1)

    c2, s2 = np.cos(float(b2[6])), np.sin(float(b2[6]))
    cx, cy = float(b2[0]), float(b2[1])
    hw2, hl2 = 0.5 * float(b2[3]), 0.5 * float(b2[4])
    planes = [(c2, s2, hw2 + c2 * cx + s2 * cy),
              (-c2, -s2, hw2 - c2 * cx - s2 * cy),
              (-s2, c2, hl2 - s2 * cx + c2 * cy),
              (s2, -c2, hl2 + s2 * cx - c2 * cy)]
    for nx, ny, cc in planes:
        if len(poly) < 3:
            return 0.0
        out = []
        d = poly @ np.array([nx, ny]) - cc
        for i in range(len(poly)):
            j = (i + 1) % len(poly)
            if d[i] <= 0:
                out.append(poly[i])
            if (d[i] < 0 < d[j]) or (d[j] < 0 < d[i]):
                t = d[i] / (d[i] - d[j])
                out.append(poly[i] + t * (poly[j] - poly[i]))
        poly = np.asarray(out) if out else np.zeros((0, 2))
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    inter = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    inter = min(max(inter, 0.0), a1, a2)
    return inter / (a1 + a2 - inter)


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray, score_thr: float,
               iou_thr: float, max_num: int):
    n, c = scores.shape
    kept = []  # (score, cls, idx)
    for cl in range(c):
        cand = np.nonzero(scores[:, cl] > score_thr)[0]
        order = cand[np.lexsort((cand, -scores[cand, cl]))]
        alive = []
        for i in order:
            if all(_rotated_iou_np(boxes[k], boxes[i]) <= iou_thr
                   for k in alive):
                alive.append(i)
                kept.append((float(scores[i, cl]), cl, int(i)))
    kept.sort(key=lambda t: (-t[0], t[1], t[2]))
    kept = kept[:max_num]
    out_boxes = np.zeros((max_num, boxes.shape[-1]), np.float32)
    out_scores = np.zeros((max_num,), np.float32)
    out_labels = np.zeros((max_num,), np.int32)
    out_valid = np.zeros((max_num,), bool)
    for o, (sc, cl, i) in enumerate(kept):
        out_boxes[o] = boxes[i]
        out_scores[o] = sc
        out_labels[o] = cl
        out_valid[o] = True
    return out_boxes, out_scores, out_labels, out_valid


def nms_rotated_multiclass_host(
        boxes: np.ndarray, scores: np.ndarray, score_thr: float,
        iou_thr: float, max_num: int) -> Tuple[np.ndarray, ...]:
    """One sample's multi-class rotated NMS on the host.

    boxes: (N, D>=7) float32; scores: (N, C) float32.  Returns padded
    ``(max_num, D)`` boxes, scores, int32 labels, bool validity — the
    same contract as the in-graph ``multiclass_nms_rotated``.
    """
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    lib = get_lib()
    if lib is None:
        return _nms_numpy(boxes, scores, score_thr, iou_thr, max_num)
    n, c = scores.shape
    d = boxes.shape[-1]
    out_boxes = np.empty((max_num, d), np.float32)
    out_scores = np.empty((max_num,), np.float32)
    out_labels = np.empty((max_num,), np.int32)
    cnt = lib.nms_rotated_multiclass(
        boxes, scores, n, c, d, float(score_thr), float(iou_thr),
        int(max_num), out_boxes, out_scores, out_labels)
    out_valid = np.arange(max_num) < cnt
    return out_boxes, out_scores, out_labels, out_valid


def nms_rotated_multiclass_host_batch(boxes: np.ndarray, scores: np.ndarray,
                                      score_thr: float, iou_thr: float,
                                      max_num: int):
    """Batched host NMS: (B, N, D) boxes + (B, N, C) scores."""
    outs = [nms_rotated_multiclass_host(b, s, score_thr, iou_thr, max_num)
            for b, s in zip(boxes, scores)]
    return tuple(np.stack(x) for x in zip(*outs))
