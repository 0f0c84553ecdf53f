"""Semantic occupancy head + segmentation losses.

Parity targets:
- ``BEVOCCHead2Dv2`` (reference ``bevfusion/dense_heads/bev_occ_head.py
  :720-831``): 3x3 conv on the BEV -> per-column MLP predicter
  (Linear -> Softplus -> Linear) -> (Dx, Dy, Dz, n_cls) logits; loss =
  CE + sem_scal + geo_scal (precision/recall/specificity BCE terms);
- ``geo_scal_loss`` / ``sem_scal_loss`` (``:805-876``);
- Lovasz-softmax (``bevfusion/losses/lovasz_softmax.py``) for the
  3D-head variants.

Class 0 is free space; semantic classes are 1..n_cls-1; 255 marks
unknown voxels (masked out).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.losses import softmax_cross_entropy


class BEVOCCHead2D(nn.Module):
    """BEV features (Dy, Dx, C) -> occupancy logits (Dx, Dy, Dz, n_cls)."""

    out_dim: int = 256
    dz: int = 16
    num_classes: int = 12
    use_predicter: bool = True

    @nn.compact
    def __call__(self, bev):
        # bev: (..., Dy, Dx, C); final conv then transpose to (Dx, Dy, C).
        x = nn.Conv(self.out_dim if self.use_predicter
                    else self.num_classes * self.dz, (3, 3),
                    padding='SAME')(bev)
        x = jnp.swapaxes(x, -3, -2)          # (..., Dx, Dy, C)
        if self.use_predicter:
            x = nn.Dense(self.out_dim * 2)(x)
            x = jax.nn.softplus(x)
            x = nn.Dense(self.num_classes * self.dz)(x)
        return x.reshape(x.shape[:-1] + (self.dz, self.num_classes))


class BEVOCCHead3D(nn.Module):
    """3D-conv occupancy head (reference ``BEVOCCHead3D(v2)`` variants):
    lift the BEV into a (Dy, Dx, Dz, C') volume and refine with 3D
    convolutions before per-voxel classification."""

    mid_dim: int = 64
    dz: int = 16
    num_classes: int = 12

    @nn.compact
    def __call__(self, bev):
        # bev: (..., Dy, Dx, C) -> volume (..., Dy, Dx, Dz, C').
        x = nn.Dense(self.dz * self.mid_dim)(bev)
        x = x.reshape(x.shape[:-1] + (self.dz, self.mid_dim))
        x = nn.Conv(self.mid_dim, (3, 3, 3), padding='SAME')(x)
        x = nn.relu(x)
        x = nn.Conv(self.mid_dim, (3, 3, 3), padding='SAME')(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes)(x)
        return jnp.swapaxes(x, -4, -3)       # (..., Dx, Dy, Dz, n_cls)


def _bce_scalar(p, eps: float = 1e-7):
    """binary_cross_entropy(p, 1) for a probability scalar."""
    return -jnp.log(jnp.clip(p, eps, 1.0))


def geo_scal_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Geometric scene-completion affinity loss (reference ``:805-833``)."""
    probs = jax.nn.softmax(logits, axis=-1)
    empty = probs[..., 0]
    nonempty_p = 1.0 - empty
    mask = target != 255
    nonempty_t = ((target != 0) & mask).astype(jnp.float32)
    nonempty_p = jnp.where(mask, nonempty_p, 0.0)
    empty_p = jnp.where(mask, empty, 0.0)
    empty_t = ((target == 0) & mask).astype(jnp.float32)

    inter = jnp.sum(nonempty_t * nonempty_p)
    precision = inter / jnp.clip(jnp.sum(nonempty_p), 1e-6, None)
    recall = inter / jnp.clip(jnp.sum(nonempty_t), 1e-6, None)
    spec = jnp.sum(empty_t * empty_p) / jnp.clip(jnp.sum(empty_t), 1e-6,
                                                 None)
    return _bce_scalar(precision) + _bce_scalar(recall) + _bce_scalar(spec)


def sem_scal_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-class precision/recall/specificity BCE (reference ``:835-876``)."""
    probs = jax.nn.softmax(logits, axis=-1)
    mask = target != 255
    n_cls = logits.shape[-1]

    total = 0.0
    count = 0.0
    for i in range(n_cls):
        p = jnp.where(mask, probs[..., i], 0.0)
        t = ((target == i) & mask).astype(jnp.float32)
        has_cls = jnp.sum(t) > 0

        nom = jnp.sum(p * t)
        precision = nom / jnp.clip(jnp.sum(p), 1e-6, None)
        recall = nom / jnp.clip(jnp.sum(t), 1e-6, None)
        not_t = jnp.where(mask, 1.0 - t, 0.0)
        specificity = jnp.sum((1.0 - p) * not_t) \
            / jnp.clip(jnp.sum(not_t), 1e-6, None)

        loss_cls = jnp.where(jnp.sum(p) > 0, _bce_scalar(precision), 0.0)
        loss_cls = loss_cls + _bce_scalar(recall)
        loss_cls = loss_cls + jnp.where(jnp.sum(not_t) > 0,
                                        _bce_scalar(specificity), 0.0)
        total = total + jnp.where(has_cls, loss_cls, 0.0)
        count = count + has_cls.astype(jnp.float32)
    return total / jnp.clip(count, 1.0, None)


def lovasz_softmax_loss(logits: jnp.ndarray, target: jnp.ndarray
                        ) -> jnp.ndarray:
    """Lovasz-softmax (present-classes mean), flattened formulation
    (reference ``bevfusion/losses/lovasz_softmax.py:22-328``).
    255-labeled voxels are excluded."""
    n_cls = logits.shape[-1]
    probs = jax.nn.softmax(logits.reshape(-1, n_cls), axis=-1)
    labels = target.reshape(-1)
    valid = labels != 255
    labels_safe = jnp.where(valid, labels, 0)

    def one_class(c):
        fg = ((labels_safe == c) & valid).astype(jnp.float32)
        errors = jnp.where(valid, jnp.abs(fg - probs[:, c]), -1.0)
        order = jnp.argsort(-errors)
        errors_s = errors[order]
        fg_s = fg[order]
        valid_s = errors_s >= 0.0
        gts = jnp.sum(fg_s)
        inter = gts - jnp.cumsum(fg_s)
        union = gts + jnp.cumsum(1.0 - fg_s)
        jaccard = 1.0 - inter / jnp.clip(union, 1e-6, None)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        loss_c = jnp.sum(jnp.where(valid_s, errors_s, 0.0) * grad)
        present = gts > 0
        return jnp.where(present, loss_c, 0.0), present.astype(jnp.float32)

    losses, present = jax.vmap(one_class)(jnp.arange(n_cls))
    return jnp.sum(losses) / jnp.clip(jnp.sum(present), 1.0, None)


def occ_head_loss(occ_logits: jnp.ndarray, gt_occ: jnp.ndarray,
                  use_lovasz: bool = False) -> Dict[str, jnp.ndarray]:
    """(Dx, Dy, Dz, C) logits + (Dx, Dy, Dz) int targets -> loss dict
    (reference ``BEVOCCHead2Dv2.loss``: CE + sem_scal + geo_scal)."""
    target = gt_occ.astype(jnp.int32)
    mask = target != 255
    safe = jnp.where(mask, target, 0)
    ce = softmax_cross_entropy(occ_logits, safe)
    loss_occ = jnp.sum(jnp.where(mask, ce, 0.0)) \
        / jnp.clip(jnp.sum(mask), 1, None)
    loss_ssc = sem_scal_loss(occ_logits, target) \
        + geo_scal_loss(occ_logits, target)
    out = {'loss_occ': loss_occ, 'loss_ssc': loss_ssc}
    if use_lovasz:
        out['loss_lovasz'] = lovasz_softmax_loss(occ_logits, target)
    return out
