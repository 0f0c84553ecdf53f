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
        counts = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
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
        counts = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
        assert counts['recall'] == pytest.approx(0.5)

    def test_empty_predictions(self):
        gt, _ = self._frames()
        res = amota_amotp(gt, [[] for _ in gt], dist_th=2.0)
        assert res['amota'] == 0.0

    def test_thresholds_interpolate_reference_convention(self):
        """compute_thresholds must np.interp the (recall, score) curve
        (reference algo.py:300-343), not step to the nearest achieved
        recall: 3 GT, matched scores {0.9, 0.6, 0.3} -> the threshold
        at target recall 0.5 is interp(0.5, [1/3, 2/3, 1], [.9,.6,.3])
        = 0.75, and recalls above the achieved max are nan."""
        from omnihd_scenes_tpu.eval.tracking.algo import compute_thresholds

        gt, pred = [], []
        for t, score in enumerate((0.9, 0.6, 0.3)):
            gt.append([_box(str(t), 'a', (t * 50.0, 0))])
            pred.append([_box(str(t), 'pa', (t * 50.0, 0), score=score)])
        thr, recalls = compute_thresholds([gt], [pred], dist_th=2.0,
                                          nelem=10, min_recall=0.5)
        assert recalls[0] == pytest.approx(0.5)
        assert thr[0] == pytest.approx(np.interp(
            0.5, [1 / 3, 2 / 3, 1.0], [0.9, 0.6, 0.3]))  # == 0.75
        assert thr[-1] == pytest.approx(0.3)             # recall 1.0
        # Now drop one prediction (keep the frame): max achievable
        # recall 2/3 -> the recall-1.0 threshold is unachieved -> nan.
        thr2, _ = compute_thresholds([gt], [pred[:2] + [[]]], dist_th=2.0,
                                     nelem=10, min_recall=0.5)
        assert np.isnan(thr2[-1])


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


class TestScenarioTable:
    """Reference scenarios.py methodology: hand-built track timelines
    with known MT/ML/FRAG/TID/LGD/FAF values."""

    def _scene(self, hit_pattern, extra_fp=0):
        """One GT track over len(hit_pattern) frames; pred present on
        frames where hit_pattern[i] is truthy (+ optional far FPs)."""
        gt, pred = [], []
        for t, hit in enumerate(hit_pattern):
            gt.append([_box(str(t), 'g0', (t * 1.0, 0))])
            frame = []
            if hit:
                frame.append(_box(str(t), 'p0', (t * 1.0 + 0.1, 0)))
            for k in range(extra_fp):
                frame.append(_box(str(t), f'fp{k}', (50.0 + k, 30)))
            pred.append(frame)
        return gt, pred

    def test_late_init_tid_and_leading_gap_lgd(self):
        gt, pred = self._scene([0, 0, 1, 1, 1, 1, 1, 1, 1, 1])
        c = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
        assert c['tid'] == pytest.approx(1.0)    # 2 frames x 0.5 s
        assert c['lgd'] == pytest.approx(1.0)    # leading gap counts
        assert c['frag'] == 0                    # no mid-track break
        assert c['mt'] == 1 and c['ml'] == 0     # 8/10 = 0.8 tracked

    def test_fragmentation_and_longest_gap(self):
        gt, pred = self._scene([1, 1, 1, 0, 0, 1, 1, 0, 0, 1])
        c = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
        assert c['frag'] == 2
        assert c['lgd'] == pytest.approx(1.0)    # longest gap: 2 frames
        assert c['tid'] == pytest.approx(0.0)
        assert c['mt'] == 0 and c['ml'] == 0     # 6/10 tracked

    def test_mostly_lost_and_untracked(self):
        gt, pred = self._scene([1, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        c = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
        assert c['ml'] == 1 and c['mt'] == 0

        gt2, pred2 = self._scene([0] * 10)
        c2 = accumulate_class([gt2], [pred2], 2.0, score_thr=0.0)
        assert c2['ml'] == 1
        assert np.isnan(c2['tid']) and np.isnan(c2['lgd'])

    def test_real_timestamps_drive_tid_lgd(self):
        """scene_times replaces the fixed 0.5 s assumption: TID/LGD
        follow real (non-uniform) sample timestamps."""
        gt, pred = self._scene([0, 0, 1, 1, 0, 1])
        # Non-uniform cadence: big gap between frames 1 and 2.
        times = [0.0, 0.4, 2.4, 2.9, 3.3, 3.8]
        c = accumulate_class([gt], [pred], 2.0, score_thr=0.0,
                             scene_times=[times])
        assert c['tid'] == pytest.approx(2.4)    # t[2] - t[0]
        assert c['lgd'] == pytest.approx(2.4)    # leading gap in seconds
        # Uniform 0.5 s timestamps reproduce the default exactly.
        c_def = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
        c_uni = accumulate_class([gt], [pred], 2.0, score_thr=0.0,
                                 scene_times=[[0.5 * i
                                               for i in range(6)]])
        assert c_uni['tid'] == pytest.approx(c_def['tid'])
        assert c_uni['lgd'] == pytest.approx(c_def['lgd'])

    def test_faf_counts_false_alarms_per_frame(self):
        gt, pred = self._scene([1] * 10, extra_fp=2)
        c = accumulate_class([gt], [pred], 2.0, score_thr=0.0)
        assert c['fp'] == 20
        assert c['faf'] == pytest.approx(200.0)  # fp/frames x 100

    def test_scene_isolation(self):
        """Track timelines and identity state do not leak across
        scenes: two scenes with the same ids count independently."""
        gt, pred = self._scene([1] * 5)
        c = accumulate_class([gt, gt], [pred, pred], 2.0, score_thr=0.0)
        assert c['mt'] == 2 and c['ids'] == 0

    def test_curve_and_summary_shapes(self):
        from omnihd_scenes_tpu.eval.tracking.algo import (MD_FIELDS,
                                                          accumulate_curve,
                                                          summarize_curve)
        from omnihd_scenes_tpu.eval.tracking.data_classes import (
            TRACKING_METRICS)

        gt, pred = self._scene([1, 1, 1, 0, 1, 1, 1, 1, 1, 1])
        md = accumulate_curve([gt], [pred], 2.0, nelem=10)
        assert set(md) == set(MD_FIELDS)
        assert all(len(md[f]) == 10 for f in md)
        summary = summarize_curve(md, 2.0)
        # Full reference metric-name coverage.
        assert set(TRACKING_METRICS) - {'motar'} <= set(summary) | {'gt'}
        for name in ('amota', 'amotp', 'mota', 'motp', 'mt', 'ml',
                     'faf', 'tp', 'fp', 'fn', 'ids', 'frag', 'tid',
                     'lgd', 'recall'):
            assert name in summary, name

    def test_render_artifacts(self, tmp_path):
        from omnihd_scenes_tpu.eval.tracking.algo import accumulate_curve
        from omnihd_scenes_tpu.eval.tracking.render import (
            CURVE_METRICS, render_tracking_curves)

        gt, pred = self._scene([1] * 8)
        md = accumulate_curve([gt], [pred], 2.0, nelem=5)
        render_tracking_curves({'car': md}, str(tmp_path))
        assert (tmp_path / 'plots' / 'summary.png').exists()
        for m in CURVE_METRICS:
            assert (tmp_path / 'plots' / f'{m}.png').exists()
