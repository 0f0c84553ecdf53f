"""Optimizer / LR schedule factory (optax).

Parity targets: the reference's optimizer configs — AdamW (lr 2e-4 or
1e-3, weight_decay 0.01), grad-clip max_norm 35, linear warmup then
cosine annealing or step decay, optional ``lr = lr * n_dev / 8`` linear
scaling (``tools/train.py:173-175``).  The reference's ``AdamW2``
(PyTorch-1.8 AdamW bugfix, ``models/opt/adamw.py``) is moot: optax's
adamw already applies decoupled weight decay correctly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def make_lr_schedule(base_lr: float,
                     total_steps: int,
                     policy: str = 'cosine',
                     warmup_iters: int = 500,
                     warmup_ratio: float = 1.0 / 3,
                     min_lr_ratio: float = 1e-3,
                     step_epochs: Optional[Sequence[int]] = None,
                     steps_per_epoch: int = 1):
    """Warmup + (cosine | step) schedule."""
    warmup = optax.linear_schedule(base_lr * warmup_ratio, base_lr,
                                   max(warmup_iters, 1))
    rest = max(total_steps - warmup_iters, 1)
    if policy == 'cosine':
        main = optax.cosine_decay_schedule(base_lr, rest,
                                           alpha=min_lr_ratio)
    elif policy == 'step':
        boundaries = {}
        lr = base_lr
        for e in (step_epochs or []):
            boundaries[e * steps_per_epoch - warmup_iters] = 0.1
        main = optax.piecewise_constant_schedule(base_lr, boundaries)
    else:
        raise ValueError(policy)
    return optax.join_schedules([warmup, main], [warmup_iters])


def make_optimizer(lr_schedule,
                   weight_decay: float = 0.01,
                   grad_clip_norm: float = 35.0) -> optax.GradientTransformation:
    """AdamW with global-norm gradient clipping."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(lr_schedule, weight_decay=weight_decay),
    )
