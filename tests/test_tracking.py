"""Tracking eval: GT-as-prediction scores AMOTA ~= 1; degradation
behavior under drops/identity switches."""

import json

import numpy as np
import pytest

from omnihd_scenes_tpu.eval.tracking import TrackingConfig, TrackingEval
from omnihd_scenes_tpu.eval.tracking.algo import (accumulate_class,
                                                  amota_amotp)
from omnihd_scenes_tpu.eval.tracking.data_classes import TrackingBox


def _box(token, tid, xy, name='car', score=0.9):
    return TrackingBox(sample_token=token, translation=(xy[0], xy[1], 0.0),
                       size=(2, 4, 1.5), rotation=(1, 0, 0, 0),
                       ego_translation=(xy[0], xy[1], 0.0),
                       tracking_id=str(tid), tracking_name=name,
                       tracking_score=score)


class TestAlgo:
    def _frames(self, n=6):
        """Two tracks moving along x."""
        gt, pred = [], []
        for t in range(n):
            gts = [_box(str(t), 'a', (t * 2.0, 0)),
                   _box(str(t), 'b', (t * 2.0, 10))]
            preds = [_box(str(t), 'pa', (t * 2.0 + 0.1, 0)),
                     _box(str(t), 'pb', (t * 2.0 + 0.1, 10))]
            gt.append(gts)
            pred.append(preds)
        return gt, pred

    def test_perfect_tracking(self):
        gt, pred = self._frames()
        res = amota_amotp(gt, pred, dist_th=2.0)
        assert res['amota'] > 0.95
        assert res['mota'] > 0.99
        assert res['amotp'] < 0.2

    def test_identity_switch_counted(self):
        gt, pred = self._frames()
        # Swap prediction ids halfway -> 2 id switches.
        for t in range(3, len(pred)):
            pred[t][0].tracking_id = 'pb'
            pred[t][1].tracking_id = 'pa'
        counts = accumulate_class(gt, pred, 2.0, score_thr=0.0)
        assert counts['ids'] == 2
        res = amota_amotp(gt, pred, dist_th=2.0)
        gt2, pred2 = self._frames()
        res_perfect = amota_amotp(gt2, pred2, dist_th=2.0)
        assert res['amota'] < res_perfect['amota']
        assert res['mota'] < res_perfect['mota']

    def test_missing_track_lowers_recall(self):
        gt, pred = self._frames()
        pred = [[p for p in frame if p.tracking_id == 'pa']
                for frame in pred]
        counts = accumulate_class(gt, pred, 2.0, score_thr=0.0)
        assert counts['recall'] == pytest.approx(0.5)

    def test_empty_predictions(self):
        gt, _ = self._frames()
        res = amota_amotp(gt, [[] for _ in gt], dist_th=2.0)
        assert res['amota'] == 0.0


class TestTrackingEvalE2E:
    def test_gt_as_prediction(self, synthetic_db, tmp_path):
        # Build GT-as-prediction tracking submission.
        from omnihd_scenes_tpu.eval.tracking.evaluate import load_tracking_gt

        gt = load_tracking_gt(synthetic_db, 'val_mini')
        results = {}
        for tok, boxes in gt.items():
            annos = []
            for b in boxes:
                d = b.serialize()
                d['tracking_score'] = 1.0
                annos.append(d)
            results[tok] = annos
        path = tmp_path / 'track_sub.json'
        with open(path, 'w') as f:
            json.dump({'meta': {}, 'results': results}, f)

        ev = TrackingEval(synthetic_db, TrackingConfig(), str(path),
                          'val_mini', output_dir=str(tmp_path),
                          verbose=False)
        metrics = ev.main()
        assert metrics['amota'] > 0.95, metrics['amota']
        assert metrics['mota'] > 0.99
        assert (tmp_path / 'tracking_metrics.json').exists()
