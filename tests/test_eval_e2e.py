"""End-to-end eval self-check: GT-as-prediction must score mAP ~= 1
(reference workflow: create_fake_result.py -> evaluate.py; BASELINE
config #1), plus degradation behavior under perturbation."""

import json
import os

import numpy as np
import pytest

from omnihd_scenes_tpu.devkit.fake_result import (create_fake_result,
                                                  write_fake_result)
from omnihd_scenes_tpu.eval.detection.config import config_factory
from omnihd_scenes_tpu.eval.detection.evaluate import DetectionEval


@pytest.fixture(scope='module')
def fake_result_path(synthetic_db, tmp_path_factory):
    out = tmp_path_factory.mktemp('results') / 'fake_gt.json'
    return write_fake_result(synthetic_db, str(out), split='val_mini')


def test_fake_gt_scores_perfect(synthetic_db, fake_result_path, tmp_path):
    cfg = config_factory('detection_newsc_config_final')
    ev = DetectionEval(synthetic_db, config=cfg, result_path=fake_result_path,
                       eval_set='val_mini', output_dir=str(tmp_path),
                       verbose=False)
    summary = ev.main(render_curves=False)

    assert summary['mean_ap'] > 0.98, summary['mean_ap']
    assert summary['NOS'] > 0.98, summary['NOS']
    for name, err in summary['tp_errors'].items():
        # Velocity error can be NaN-driven but cummean maps all-NaN to 1;
        # synthetic tracks have valid velocities so everything ~0.
        assert err < 0.02, (name, err)

    assert os.path.exists(tmp_path / 'metrics_summary.json')
    assert os.path.exists(tmp_path / 'metrics_details.json')


def test_perturbed_result_scores_lower(synthetic_db, fake_result_path,
                                       tmp_path):
    rng = np.random.RandomState(0)
    with open(fake_result_path) as f:
        sub = json.load(f)
    for boxes in sub['results'].values():
        for b in boxes:
            b['translation'] = [t + float(rng.uniform(-1.5, 1.5))
                                for t in b['translation']]
            b['detection_score'] = float(rng.uniform(0.3, 1.0))
    pert_path = tmp_path / 'perturbed.json'
    with open(pert_path, 'w') as f:
        json.dump(sub, f)

    cfg = config_factory('detection_newsc_config_final')
    ev = DetectionEval(synthetic_db, config=cfg, result_path=str(pert_path),
                       eval_set='val_mini', output_dir=str(tmp_path / 'out'),
                       verbose=False)
    metrics, _ = ev.evaluate()
    assert 0.0 < metrics.mean_ap < 1.0
    # Translation error should now be visibly nonzero.
    assert metrics.tp_errors['trans_err'] > 0.05


def test_empty_result_scores_zero(synthetic_db, fake_result_path, tmp_path):
    with open(fake_result_path) as f:
        sub = json.load(f)
    sub['results'] = {k: [] for k in sub['results']}
    path = tmp_path / 'empty.json'
    with open(path, 'w') as f:
        json.dump(sub, f)

    cfg = config_factory('detection_newsc_config_final')
    ev = DetectionEval(synthetic_db, config=cfg, result_path=str(path),
                       eval_set='val_mini', output_dir=str(tmp_path / 'out'),
                       verbose=False)
    metrics, _ = ev.evaluate()
    assert metrics.mean_ap == 0.0


def test_visibility_filter(synthetic_db):
    """Boxes with visibility == 0 must be dropped from GT."""
    from omnihd_scenes_tpu.eval.common import filter_eval_boxes, load_gt
    from omnihd_scenes_tpu.eval.detection.data_classes import DetectionBox

    cfg = config_factory('detection_newsc_config_final')
    gt = load_gt(synthetic_db, 'val_mini', DetectionBox, verbose=False)
    n_before = len(gt.all)
    filtered = filter_eval_boxes(synthetic_db, gt, cfg.class_range,
                                 verbose=False)
    assert all(b.visibility == 1 for b in filtered.all)
    assert len(filtered.all) <= n_before


def test_bad_conditions_filter(synthetic_db, fake_result_path, tmp_path):
    """Rainy/night-only evaluation keeps a subset of samples."""
    cfg = config_factory('detection_newsc_config_final')
    ev = DetectionEval(synthetic_db, config=cfg, result_path=fake_result_path,
                       eval_set='val_mini', output_dir=str(tmp_path),
                       verbose=False, bad_conditions=True)
    metrics, _ = ev.evaluate()
    assert metrics.mean_ap > 0.98
