"""Slow end-to-end learning validation (opt-in: OMNIHD_SLOW_TESTS=1).

Trains the tiny radar PointPillars to convergence on the synthetic set
and verifies the FULL stack coherence: a model that memorizes the train
split must score high mAP through decode -> NMS -> JSON -> devkit eval.
Reference run (TPU v5e, 250 epochs, ~6 min): train-split mAP 0.913,
NOS 0.832, per-class AP 0.85-0.96.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get('OMNIHD_SLOW_TESTS') != '1',
    reason='slow learning test; set OMNIHD_SLOW_TESTS=1')


def test_overfit_train_split_high_map(synthetic_dataroot, tmp_path):
    from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
    from omnihd_scenes_tpu.data.loader import TrainLoader
    from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
    from omnihd_scenes_tpu.models.anchor_head import DecodeCfg
    from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                    PointPillarsConfig)
    from omnihd_scenes_tpu.train.detection import (make_loss_fn,
                                                   make_predict_fn,
                                                   run_inference)
    from omnihd_scenes_tpu.train.loop import (create_train_state,
                                              make_train_step)
    from omnihd_scenes_tpu.train.optim import (make_lr_schedule,
                                               make_optimizer)
    import jax

    out = str(tmp_path / 'infos')
    create_newscenes_infos(synthetic_dataroot, out, 'synth',
                           version='v1.0-mini', max_sweeps=0)

    model_cfg = PointPillarsConfig(
        voxel_size=(0.5, 0.5, 8.0), max_voxels=4096,
        max_points_per_voxel=8, bev_hw=(160, 240), pfn_channels=(32,),
        second_channels=(32, 64, 64), fpn_channels=(32, 32, 32))
    train_ds = NewScenesDetDataset(
        ann_file=f'{out}/synth_infos_temporal_train.pkl', modality='radar',
        max_points=8000, max_gt=24, point_shuffle=True)
    eval_ds = NewScenesDetDataset(
        ann_file=f'{out}/synth_infos_temporal_train.pkl', modality='radar',
        max_points=8000, max_gt=24, test_mode=True)

    model = PointPillars(model_cfg)
    s0 = train_ds[0]
    variables = model.init(jax.random.PRNGKey(0), s0['points'][None],
                           s0['points_mask'][None], train=False)
    epochs = 250
    loader = TrainLoader(train_ds, 8, seed=0)
    tx = make_optimizer(make_lr_schedule(3e-3, len(loader) * epochs,
                                         warmup_iters=30))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(make_loss_fn(model), tx)
    for ep in range(epochs):
        loader.set_epoch(ep)
        for batch in loader:
            state, loss, _ = step_fn(state, batch)
    assert np.isfinite(float(loss))

    predict_fn = make_predict_fn(model, DecodeCfg(nms_pre=512, max_num=128))
    results = run_inference(predict_fn, state, eval_ds, 2)
    metrics = eval_ds.evaluate(results, dataroot=synthetic_dataroot,
                               version='v1.0-mini', eval_set='train_mini',
                               jsonfile_prefix=str(tmp_path / 'eval'))
    assert metrics['mAP'] > 0.6, metrics
    assert metrics['NOS'] > 0.5, metrics
