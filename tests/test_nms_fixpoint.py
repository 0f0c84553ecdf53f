"""Fixpoint NMS must agree exactly with a sequential greedy reference."""

import pytest
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.ops import nms_rotated, rotated_iou_bev


def _greedy_reference(boxes, scores, thr, valid):
    """Plain-Python sequential greedy NMS."""
    n = len(scores)
    order = sorted(range(n), key=lambda i: (-scores[i], i))
    iou = np.asarray(rotated_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    keep = np.zeros(n, bool)
    suppressed = np.zeros(n, bool)
    for i in order:
        if not valid[i] or suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if j != i and valid[j] and not suppressed[j] \
                    and scores[j] <= scores[i] and iou[i, j] > thr:
                if (scores[j] < scores[i]) or (j > i):
                    suppressed[j] = True
    return keep


def _rand_boxes(rng, n, spread=6.0):
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = rng.uniform(-spread, spread, n)
    boxes[:, 1] = rng.uniform(-spread, spread, n)
    boxes[:, 3] = rng.uniform(1, 3, n)
    boxes[:, 4] = rng.uniform(1, 4, n)
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.slow
def test_matches_sequential_greedy_dense():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        boxes = _rand_boxes(rng, n, spread=4.0)   # dense overlaps
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(size=n) > 0.1
        keep = np.asarray(nms_rotated(jnp.asarray(boxes),
                                      jnp.asarray(scores), 0.2,
                                      jnp.asarray(valid)))
        ref = _greedy_reference(boxes, scores, 0.2, valid)
        assert np.array_equal(keep, ref), trial


@pytest.mark.slow
def test_long_chain_converges():
    """A long suppression chain (worst case for fixpoint iteration)."""
    n = 40
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = np.arange(n) * 1.2   # overlapping chain along x
    boxes[:, 3] = 2.0
    boxes[:, 4] = 2.0
    boxes[:, 5] = 1.0
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    keep = np.asarray(nms_rotated(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.1))
    ref = _greedy_reference(boxes, scores, 0.1, np.ones(n, bool))
    assert np.array_equal(keep, ref)
    # Alternating survival pattern for a chain.
    assert keep[0] and not keep[1] and keep[2]
