"""Host NMS (csrc nms_rotated_multiclass + NumPy fallback) parity with
the in-graph multiclass_nms_rotated.

Disagreements are only acceptable for candidate pairs whose rotated IoU
sits within float tolerance of the suppression threshold (the greedy
decision is genuinely discontinuous there); the tests assert exact
set equality after excluding such pairs — and the random geometry makes
them vanishingly rare, so the assertions are effectively exact.
"""

import numpy as np
import pytest

from omnihd_scenes_tpu.data.native import native_available
from omnihd_scenes_tpu.ops.boxes3d import rotated_iou_bev
from omnihd_scenes_tpu.ops.nms import multiclass_nms_rotated
from omnihd_scenes_tpu.ops.nms_host import (_nms_numpy, _rotated_iou_np,
                                            nms_rotated_multiclass_host,
                                            nms_rotated_multiclass_host_batch)

SCORE_THR, IOU_THR, MAX_NUM = 0.05, 0.2, 500


def _random_candidates(seed, n=200, c=4, spread=30.0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = rng.uniform(-spread, spread, n)
    boxes[:, 1] = rng.uniform(-spread * 2 / 3, spread * 2 / 3, n)
    boxes[:, 2] = rng.uniform(-2, 0, n)
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.randn(n, 2)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    # Make most candidates sub-threshold like a trained model.
    scores *= rng.uniform(0, 0.4, (n, 1))
    return boxes, scores


def _sets(out):
    """Set of (label, rounded box row) for order-insensitive comparison."""
    boxes, scores, labels, valid = (np.asarray(x) for x in out)
    return {(int(l), tuple(np.round(b, 4)), round(float(s), 5))
            for b, s, l, v in zip(boxes, scores, labels, valid) if v}


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_iou_matches_device(seed):
    """Host polygon-clip IoU == device Green's-theorem IoU."""
    boxes, _ = _random_candidates(seed, n=64)
    dev = np.asarray(rotated_iou_bev(boxes, boxes))
    host = np.array([[_rotated_iou_np(a, b) for b in boxes] for a in boxes])
    np.testing.assert_allclose(host, dev, atol=2e-4)


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4, 5])
def test_host_matches_graph(seed):
    boxes, scores = _random_candidates(seed)
    graph = multiclass_nms_rotated(boxes, scores, SCORE_THR, IOU_THR,
                                   MAX_NUM)
    host = nms_rotated_multiclass_host(boxes, scores, SCORE_THR, IOU_THR,
                                       MAX_NUM)
    g, h = _sets(graph), _sets(host)
    if g != h:
        # Only threshold-boundary pairs may disagree.
        iou = np.asarray(rotated_iou_bev(boxes, boxes))
        assert np.any(np.abs(iou - IOU_THR) < 1e-3), (g ^ h)
        pytest.skip('IoU at threshold boundary (measure-zero tie)')


@pytest.mark.parametrize('seed', [0, 1])
def test_numpy_fallback_matches_native(seed):
    if not native_available():
        pytest.skip('native lib unavailable')
    boxes, scores = _random_candidates(seed, n=80)
    a = nms_rotated_multiclass_host(boxes, scores, SCORE_THR, IOU_THR, 64)
    b = _nms_numpy(boxes, scores, SCORE_THR, IOU_THR, 64)
    assert _sets(a) == _sets(b)


def test_dense_overlap_cluster():
    """Heavy mutual overlap (untrained-model regime): one survivor per
    cluster per class, native == graph."""
    rng = np.random.RandomState(7)
    n = 120
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = rng.uniform(-1, 1, n)          # one dense cluster
    boxes[:, 1] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = 4.0
    boxes[:, 6] = rng.uniform(-0.1, 0.1, n)
    scores = rng.uniform(0.1, 0.9, (n, 2)).astype(np.float32)
    graph = multiclass_nms_rotated(boxes, scores, SCORE_THR, IOU_THR, 32)
    host = nms_rotated_multiclass_host(boxes, scores, SCORE_THR, IOU_THR, 32)
    assert _sets(graph) == _sets(host)


def test_batch_wrapper_shapes():
    boxes, scores = _random_candidates(0)
    out = nms_rotated_multiclass_host_batch(
        np.stack([boxes, boxes]), np.stack([scores, scores]),
        SCORE_THR, IOU_THR, 100)
    assert out[0].shape == (2, 100, 9)
    assert out[1].shape == (2, 100)
    assert out[2].dtype == np.int32
    assert out[3].dtype == bool
    np.testing.assert_array_equal(out[0][0], out[0][1])


def test_empty_when_all_below_threshold():
    boxes, scores = _random_candidates(3)
    out = nms_rotated_multiclass_host(boxes, scores * 0.0 + 0.01,
                                      SCORE_THR, IOU_THR, 50)
    assert not out[3].any()
    assert np.all(out[0] == 0)


def test_predict_fn_host_nms_matches_in_graph():
    """make_predict_fn_generic(host_nms=True) returns the same detections
    as the in-graph NMS path on a real (tiny) anchor-family model."""
    import jax
    from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                    PointPillarsConfig)
    from omnihd_scenes_tpu.train.builder import make_predict_fn_generic

    cfg = PointPillarsConfig(
        point_cloud_range=(-10, -10, -3.0, 10, 10, 5.0),
        voxel_size=(2.0, 2.0, 8.0), max_voxels=64,
        max_points_per_voxel=4, bev_hw=(10, 10),
        pfn_channels=(8,), second_channels=(8, 8, 8),
        fpn_channels=(8, 8, 8))
    model = PointPillars(cfg)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-9, 9, (2, 64, 8)).astype(np.float32)
    batch = {'points': pts, 'points_mask': np.ones((2, 64), bool)}
    variables = model.init(jax.random.PRNGKey(0), pts[:1],
                           batch['points_mask'][:1], train=False)
    params = variables['params']
    stats = variables.get('batch_stats', {})

    graph_fn = make_predict_fn_generic(model, 'pointpillars', cfg.anchors())
    host_fn = make_predict_fn_generic(model, 'pointpillars', cfg.anchors(),
                                      host_nms=True)
    g_dets, g_occ = graph_fn(params, stats, batch)
    h_dets, h_occ = host_fn(params, stats, batch)
    assert g_occ is None and h_occ is None
    for sample in range(2):
        g = _sets(tuple(np.asarray(x)[sample] for x in g_dets))
        h = _sets(tuple(np.asarray(x)[sample] for x in h_dets))
        assert g == h
