"""Loss functions (jit-friendly, mask-weighted).

Parity targets: mmdet ``FocalLoss`` (sigmoid, gamma=2, alpha=0.25),
``SmoothL1Loss`` (beta=1/9), softmax cross-entropy for the direction
classifier — as wired in the reference anchor-head configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray,
                       one_hot_targets: jnp.ndarray,
                       gamma: float = 2.0,
                       alpha: float = 0.25) -> jnp.ndarray:
    """Element-wise sigmoid focal loss (same shape as logits)."""
    p = jax.nn.sigmoid(logits)
    ce = (jnp.logaddexp(0.0, logits) - logits * one_hot_targets)
    p_t = p * one_hot_targets + (1 - p) * (1 - one_hot_targets)
    alpha_t = alpha * one_hot_targets + (1 - alpha) * (1 - one_hot_targets)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0 / 9.0) -> jnp.ndarray:
    """Element-wise smooth L1 (Huber) loss."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def softmax_cross_entropy(logits: jnp.ndarray,
                          labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def binary_cross_entropy(logits: jnp.ndarray,
                         targets: jnp.ndarray) -> jnp.ndarray:
    """Element-wise BCE with logits."""
    return jnp.logaddexp(0.0, logits) - logits * targets
