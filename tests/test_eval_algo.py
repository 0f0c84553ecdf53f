"""Detection eval algorithm unit tests (methodology modeled on the
nuScenes-style tests referenced in SURVEY.md §4: mock boxes, algorithm
invariants, serialization round-trips)."""

import json

import numpy as np
import pytest

from omnihd_scenes_tpu.eval.common import (EvalBoxes, angle_diff,
                                           center_distance, cummean,
                                           scale_iou, velocity_l2, yaw_diff)
from omnihd_scenes_tpu.eval.detection.algo import accumulate, calc_ap, calc_tp
from omnihd_scenes_tpu.eval.detection.config import config_factory
from omnihd_scenes_tpu.eval.detection.data_classes import (
    DetectionBox, DetectionMetricData, DetectionMetricDataList,
    DetectionMetrics)
from omnihd_scenes_tpu.utils.quaternion import Quaternion


def _box(token='s0', xy=(0.0, 0.0), size=(2.0, 4.0, 1.5), yaw=0.0,
         vel=(0.0, 0.0), name='car', score=-1.0):
    q = Quaternion(axis=[0, 0, 1], radians=yaw)
    return DetectionBox(sample_token=token,
                        translation=(xy[0], xy[1], 0.0),
                        size=size,
                        rotation=tuple(q.elements.tolist()),
                        velocity=vel,
                        ego_translation=(xy[0], xy[1], 0.0),
                        detection_name=name,
                        detection_score=float(score))


class TestUtils:
    def test_center_distance(self):
        assert np.isclose(center_distance(_box(xy=(0, 0)), _box(xy=(3, 4))), 5.0)

    def test_velocity_l2_nan(self):
        v = velocity_l2(_box(vel=(np.nan, np.nan)), _box(vel=(0, 0)))
        assert np.isnan(v)

    def test_yaw_diff_period(self):
        assert np.isclose(yaw_diff(_box(yaw=0.1), _box(yaw=-0.1)), 0.2)
        # Wrap-around.
        assert np.isclose(yaw_diff(_box(yaw=np.pi - 0.05),
                                   _box(yaw=-np.pi + 0.05)), 0.1, atol=1e-12)

    def test_angle_diff_signed(self):
        assert np.isclose(angle_diff(0.1, -0.1, 2 * np.pi), 0.2)
        assert np.isclose(angle_diff(-0.1, 0.1, 2 * np.pi), -0.2)

    def test_scale_iou(self):
        assert np.isclose(scale_iou(_box(size=(2, 2, 2)), _box(size=(2, 2, 2))), 1.0)
        # Half-size box: inter=1, union=8+1-1=8.
        assert np.isclose(scale_iou(_box(size=(2, 2, 2)), _box(size=(1, 1, 1))),
                          1.0 / 8.0)

    def test_cummean(self):
        x = np.array([1.0, np.nan, 3.0])
        assert np.allclose(cummean(x), [1.0, 1.0, 2.0])
        assert np.allclose(cummean(np.array([np.nan, np.nan])), [1.0, 1.0])


class TestAccumulate:
    def _gt_pred(self):
        gt = EvalBoxes()
        gt.add_boxes('s0', [_box(xy=(0, 0)), _box(xy=(10, 0))])
        preds = EvalBoxes()
        preds.add_boxes('s0', [
            _box(xy=(0.5, 0), score=0.9),    # TP (0.5m off)
            _box(xy=(10.2, 0), score=0.8),   # TP
            _box(xy=(30, 0), score=0.7),     # FP
        ])
        return gt, preds

    def test_perfect_and_fp(self):
        gt, preds = self._gt_pred()
        md = accumulate(gt, preds, 'car', center_distance, 2.0, verbose=False)
        # Recall reaches 1.0; precision at max recall is 2/2 before the FP.
        assert np.isclose(md.max_recall, 1.0)
        ap = calc_ap(md, 0.1, 0.1)
        assert 0.9 < ap <= 1.0

    def test_no_gt_class(self):
        gt, preds = self._gt_pred()
        md = accumulate(gt, preds, 'pedestrian', center_distance, 2.0,
                        verbose=False)
        assert np.allclose(md.precision, 0.0)

    def test_gt_used_once(self):
        gt = EvalBoxes()
        gt.add_boxes('s0', [_box(xy=(0, 0))])
        preds = EvalBoxes()
        preds.add_boxes('s0', [_box(xy=(0.1, 0), score=0.9),
                               _box(xy=(0.2, 0), score=0.8)])
        md = accumulate(gt, preds, 'car', center_distance, 2.0, verbose=False)
        # Second prediction must be a FP: precision at recall=1 is 1.0 but
        # drops once the duplicate is consumed.
        assert np.isclose(md.max_recall, 1.0)
        ap = calc_ap(md, 0.0, 0.0)
        assert ap < 1.0

    def test_threshold_strictness(self):
        gt = EvalBoxes()
        gt.add_boxes('s0', [_box(xy=(0, 0))])
        preds = EvalBoxes()
        preds.add_boxes('s0', [_box(xy=(2.0, 0), score=0.9)])
        # Distance exactly == threshold is NOT a match (strict <).
        md = accumulate(gt, preds, 'car', center_distance, 2.0, verbose=False)
        assert np.allclose(md.precision, 0.0)

    def test_tp_errors_zero_for_perfect(self):
        gt = EvalBoxes()
        gt.add_boxes('s0', [_box(xy=(i * 5.0, 0)) for i in range(10)])
        preds = EvalBoxes()
        preds.add_boxes('s0', [_box(xy=(i * 5.0, 0), score=0.9 - i * 0.01)
                               for i in range(10)])
        md = accumulate(gt, preds, 'car', center_distance, 2.0, verbose=False)
        for m in ('trans_err', 'scale_err', 'orient_err', 'vel_err'):
            assert np.isclose(calc_tp(md, 0.1, m), 0.0, atol=1e-9)


class TestCalcAp:
    def test_bounds(self):
        md = DetectionMetricData.random_md(np.random.RandomState(0))
        for mr, mp in [(0.1, 0.1), (0.0, 0.0), (0.5, 0.5)]:
            ap = calc_ap(md, mr, mp)
            assert 0.0 <= ap <= 1.0

    def test_no_predictions_ap_zero(self):
        md = DetectionMetricData.no_predictions()
        assert calc_ap(md, 0.1, 0.1) == 0.0

    def test_calc_tp_no_overlap(self):
        md = DetectionMetricData.no_predictions()
        assert calc_tp(md, 0.1, 'trans_err') == 1.0


class TestSerialization:
    def test_metric_data_round_trip(self):
        md = DetectionMetricData.random_md(np.random.RandomState(1))
        md2 = DetectionMetricData.deserialize(
            json.loads(json.dumps(md.serialize())))
        assert md == md2

    def test_metrics_round_trip(self):
        cfg = config_factory('detection_newsc_config_final')
        metrics = DetectionMetrics(cfg)
        metrics.add_label_ap('car', 1.0, 0.5)
        metrics.add_label_tp('car', 'trans_err', 0.3)
        metrics.add_runtime(1.0)
        m2 = DetectionMetrics.deserialize(
            json.loads(json.dumps(metrics.serialize())))
        assert m2.get_label_ap('car', 1.0) == 0.5

    def test_box_round_trip(self):
        b = _box(score=0.5)
        b2 = DetectionBox.deserialize(json.loads(json.dumps(b.serialize())))
        assert b == b2

    def test_metric_data_list_round_trip(self):
        mdl = DetectionMetricDataList()
        mdl.set('car', 1.0, DetectionMetricData.random_md(np.random.RandomState(2)))
        mdl2 = DetectionMetricDataList.deserialize(
            json.loads(json.dumps(mdl.serialize())))
        assert mdl == mdl2


class TestNOS:
    def test_nos_formula(self):
        cfg = config_factory('detection_newsc_config_final')
        metrics = DetectionMetrics(cfg)
        for name in cfg.class_names:
            for th in cfg.dist_ths:
                metrics.add_label_ap(name, th, 1.0)
            for m in ('trans_err', 'scale_err', 'orient_err', 'vel_err'):
                metrics.add_label_tp(name, m, 0.0)
        assert np.isclose(metrics.no_score, 1.0)
        assert np.isclose(metrics.mean_ap, 1.0)

    def test_nos_half(self):
        cfg = config_factory('detection_newsc_config_final')
        metrics = DetectionMetrics(cfg)
        for name in cfg.class_names:
            for th in cfg.dist_ths:
                metrics.add_label_ap(name, th, 0.5)
            for m in ('trans_err', 'scale_err', 'orient_err', 'vel_err'):
                metrics.add_label_tp(name, m, 1.0)  # score contribution 0
        # NOS = (4*0.5 + 0)/8 = 0.25
        assert np.isclose(metrics.no_score, 0.25)
