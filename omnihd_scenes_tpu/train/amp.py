"""Mixed precision (bf16) training support.

Parity target: the reference's fp16 path (``tools/fp16/train.py``,
``Fp16OptimizerHook`` in ``apis/mmdet_train.py:134-137``).  On TPU the
native half type is bfloat16: same exponent range as fp32, so the
reference's loss scaling machinery is unnecessary — the policy is
simply "bf16 compute, fp32 master params and loss".

``bf16_policy(loss_fn)`` casts params and floating batch inputs to
bf16 for the forward/backward; gradients come back in bf16 and are
upcast before the (fp32) optimizer update.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _to_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, tree)


def _to_f32(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, 'dtype') and x.dtype == jnp.bfloat16 else x, tree)


def bf16_policy(loss_fn: Callable) -> Callable:
    """Wrap a loss_fn with the bf16-compute / fp32-state policy."""

    def wrapped(params, batch_stats, batch):
        loss, (aux, new_stats) = loss_fn(_to_bf16(params), batch_stats,
                                         _to_bf16(batch))
        return loss.astype(jnp.float32), (aux, _to_f32(new_stats))

    return wrapped
