"""Rotated NMS and box post-processing (TPU-native, static shapes).

Replaces the mmcv rotated-NMS CUDA kernel used by the reference's
``Anchor3DHead.get_bboxes`` path (``test_cfg: use_rotate_nms=True,
nms_pre=1000, nms_thr=0.2, score_thr=0.05, max_num=500``).

Greedy NMS is inherently sequential, which is poison for a TPU
(N tiny latency-bound steps).  Instead we iterate the suppression
fixpoint::

    alive_{k+1}[j] = valid[j] and not any_i(prec[i,j] and S[i,j] and alive_k[i])

where ``prec`` orders boxes by descending score and ``S`` is the
IoU-over-threshold matrix.  Any fixpoint of this map equals the greedy
solution (induction over score rank), and iterating from
``alive_0 = valid`` converges in at most the longest suppression-chain
depth — a handful of vectorized O(N^2) boolean steps in practice, with
an N-step worst-case bound enforced by the ``while_loop``.

The IoU matrix is built once per sample in row tiles (bounded
intermediates) and shared by all classes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.ops.boxes3d import rotated_iou_bev

_IOU_TILE = 128


def _iou_over_thr_matrix(boxes: jnp.ndarray, thr: float) -> jnp.ndarray:
    """(N, N) bool matrix iou > thr.

    IoU is symmetric, so only the upper-triangular tile blocks are
    evaluated (~45% less polygon-clipping work at N=1000) and the
    result is mirrored.
    """
    n = boxes.shape[0]
    pad = (-n) % _IOU_TILE
    padded = jnp.concatenate(
        [boxes, jnp.zeros((pad, boxes.shape[-1]), boxes.dtype)]) \
        if pad else boxes
    n_tiles = padded.shape[0] // _IOU_TILE
    tiles = padded.reshape(n_tiles, _IOU_TILE, boxes.shape[-1])

    ti, tj = jnp.asarray([(i, j) for i in range(n_tiles)
                          for j in range(i, n_tiles)]).T  # static lists

    def block(pair):
        i, j = pair
        return rotated_iou_bev(tiles[i], tiles[j]) > thr

    blocks = jax.lax.map(block, (ti, tj))       # (B, T, T) bool
    full = jnp.zeros((n_tiles, n_tiles, _IOU_TILE, _IOU_TILE), bool)
    full = full.at[ti, tj].set(blocks)
    s = full.transpose(0, 2, 1, 3).reshape(padded.shape[0],
                                           padded.shape[0])
    s = s | s.T
    return s[:n, :n]


_MAX_FIXPOINT_ITERS = 48


def _greedy_fixpoint(s_mat: jnp.ndarray, prec: jnp.ndarray,
                     valid: jnp.ndarray,
                     max_iters: int = _MAX_FIXPOINT_ITERS) -> jnp.ndarray:
    """Iterate suppression to the (unique, greedy) fixpoint.

    Convergence needs one iteration per suppression-chain level; real
    detections converge in < 10.  ``max_iters`` bounds the worst case
    (untrained models emit degenerate all-overlapping boxes whose chains
    can reach the candidate count) — at the cap the result equals greedy
    NMS truncated at that chain depth, which only affects boxes that
    sit behind 48+ consecutive suppressions.
    """
    sp = s_mat & prec

    def cond(carry):
        alive, prev, it = carry
        return (it < max_iters) & jnp.any(alive != prev)

    def body(carry):
        alive, _, it = carry
        suppressed = jnp.any(sp & alive[:, None], axis=0)
        return (valid & ~suppressed, alive, it + 1)

    alive0 = valid
    alive, _, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.zeros_like(alive0), jnp.int32(0)))
    return alive


def _precedence(scores: jnp.ndarray) -> jnp.ndarray:
    """prec[i, j]: box i is visited before box j in greedy order
    (higher score first, ties by lower index)."""
    n = scores.shape[0]
    idx = jnp.arange(n)
    higher = scores[:, None] > scores[None, :]
    tie = (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :])
    return higher | tie


def nms_rotated(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float,
                valid: jnp.ndarray = None) -> jnp.ndarray:
    """Greedy rotated-BEV NMS; returns the (N,) bool keep mask."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s_mat = _iou_over_thr_matrix(boxes, iou_threshold)
    prec = _precedence(jnp.where(valid, scores, -jnp.inf))
    return _greedy_fixpoint(s_mat, prec, valid)


def multiclass_nms_rotated(boxes: jnp.ndarray,
                           scores: jnp.ndarray,
                           score_thr: float,
                           iou_threshold: float,
                           max_num: int):
    """Per-class rotated NMS over a (N, num_classes) score matrix.

    Matches mmdet3d ``box3d_multiclass_nms`` semantics (class-wise NMS,
    concatenated, top ``max_num`` by score).  The IoU matrix is computed
    once and shared across classes.  Returns fixed-size padded outputs:
    (max_num, D) boxes, (max_num,) scores/labels, bool validity.
    """
    n, num_classes = scores.shape
    s_mat = _iou_over_thr_matrix(boxes, iou_threshold)

    def one_class(cls_scores):
        cand = cls_scores > score_thr
        prec = _precedence(jnp.where(cand, cls_scores, -jnp.inf))
        return _greedy_fixpoint(s_mat, prec, cand)

    keep = jax.vmap(one_class, in_axes=1)(scores)               # (C, N)

    flat_scores = jnp.where(keep, scores.T, -jnp.inf).reshape(-1)  # (C*N,)
    flat_labels = jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), n)
    flat_keep = keep.reshape(-1)

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
