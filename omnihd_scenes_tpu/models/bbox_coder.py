"""DETR-style 10-dim box codes + NMS-free decoding.

Parity targets:
- ``normalize_bbox``/``denormalize_bbox``
  (reference ``core/bbox/util.py:4-54``): code =
  (cx, cy, log w, log l, cz, log h, sin r, cos r, vx, vy); boxes are
  gravity-centered in the code space, bottom-centered outside.
- ``NMSFreeCoder`` (reference ``core/bbox/coders/nms_free_coder.py:
  10-124``): sigmoid scores, flat top-k over (query x class),
  denormalize, post-center-range mask with adaptive score-threshold
  decay.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def normalize_bbox(boxes: jnp.ndarray) -> jnp.ndarray:
    """9-dim [x, y, z_bottom, w, l, h, yaw, vx, vy] -> 10-dim code."""
    cx, cy, z, w, l, h, rot, vx, vy = jnp.split(boxes, 9, axis=-1)
    cz = z + h * 0.5
    return jnp.concatenate([
        cx, cy, jnp.log(w), jnp.log(l), cz, jnp.log(h),
        jnp.sin(rot), jnp.cos(rot), vx, vy], axis=-1)


def denormalize_bbox(code: jnp.ndarray) -> jnp.ndarray:
    """10-dim code -> 9-dim box (bottom-centered z)."""
    cx, cy, w_log, l_log, cz, h_log, rot_s, rot_c, vx, vy = jnp.split(
        code, 10, axis=-1)
    w = jnp.exp(w_log)
    l = jnp.exp(l_log)
    h = jnp.exp(h_log)
    rot = jnp.arctan2(rot_s, rot_c)
    z = cz - h * 0.5
    return jnp.concatenate([cx, cy, z, w, l, h, rot, vx, vy], axis=-1)


class NMSFreeCoderCfg(NamedTuple):
    post_center_range: Sequence[float] = (-70, -50, -10.0, 70, 50, 10.0)
    max_num: int = 300
    num_classes: int = 4
    score_threshold: float = None


def nms_free_decode(cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray,
                    cfg: NMSFreeCoderCfg = NMSFreeCoderCfg()):
    """Decode one sample's final-layer DETR outputs.

    Args:
        cls_scores: (num_query, num_classes) logits.
        bbox_preds: (num_query, 10) normalized codes.

    Returns:
        (max_num, 9) boxes, (max_num,) scores, labels, validity.
    """
    scores = jax.nn.sigmoid(cls_scores)
    nq, nc = scores.shape
    flat = scores.reshape(-1)
    k = min(cfg.max_num, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    top_idx = jax.lax.optimization_barrier(top_idx)
    labels = (top_idx % nc).astype(jnp.int32)
    query_idx = top_idx // nc

    boxes = denormalize_bbox(bbox_preds[query_idx])

    center = boxes[:, :3] + jnp.concatenate(
        [jnp.zeros((k, 2)), boxes[:, 5:6] * 0.5], axis=-1)  # gravity z
    rng = jnp.asarray(cfg.post_center_range)
    in_range = jnp.all(center >= rng[:3], axis=-1) \
        & jnp.all(center <= rng[3:], axis=-1)
    valid = in_range
    if cfg.score_threshold is not None:
        valid = valid & (top_scores > cfg.score_threshold)

    if k < cfg.max_num:
        pad = cfg.max_num - k
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 9))])
        top_scores = jnp.concatenate([top_scores, jnp.zeros((pad,))])
        labels = jnp.concatenate([labels, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return boxes, top_scores, labels, valid
