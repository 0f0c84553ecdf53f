"""Profiling helpers.

Parity targets: the reference's ``run_time`` perf_counter decorator
(``models/utils/bricks.py:7-20``) and the commented-out mmcv
profiler-hook (``apis/mmdet_train.py:149-152``) — here backed by
``jax.profiler`` traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from functools import wraps

_STATS = defaultdict(lambda: [0.0, 0])


def run_time(name: str):
    """Decorator: accumulate host-side wall time under ``name``."""

    def deco(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            dt = time.perf_counter() - t0
            _STATS[name][0] += dt
            _STATS[name][1] += 1
            return out

        return wrapper

    return deco


def timing_stats() -> dict:
    return {k: {'total_s': v[0], 'calls': v[1],
                'mean_ms': v[0] / max(v[1], 1) * 1e3}
            for k, v in _STATS.items()}


def reset_timing_stats():
    _STATS.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (open in XProf / TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
