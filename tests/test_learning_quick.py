"""Quick-tier learned-accuracy bound (VERDICT r4 item 9).

The default CI previously asserted shapes/finiteness only; the
learning bounds lived behind OMNIHD_SLOW_TESTS.  This test trains a
micro PointPillars on the synthetic train split (8 samples) on the
virtual CPU backend and asserts a real mAP through the FULL stack:
voxelize -> PFN -> SECOND -> anchor assign/loss -> AdamW -> decode ->
NMS -> result JSON -> devkit eval.  A silent numeric regression in any
of those stages drops the score below the bound.

Budget: ~85 s single-core (measured 73.5 s train+init, 9.9 s
predict+eval; mAP 0.677 / NOS 0.718 at this exact recipe, so the
asserted 0.5 / 0.45 bounds carry ~0.17 margin).  Deterministic: seeded
synthetic set, seeded loader, single-host CPU jit.

The pc_range is cropped to +/-40 x +/-30 (objects spawn within +/-30 x
+/-20 in global frame, devkit/synthetic.py:141): the smaller canvas is
what makes a 350-epoch overfit fit the quick tier; a few boxes drift
out of range over a scene and cap recall, which the margin absorbs.
"""

import numpy as np


def test_micro_train_reaches_map_bound(synthetic_dataroot, tmp_path):
    import jax

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

    out = str(tmp_path / 'infos')
    create_newscenes_infos(synthetic_dataroot, out, 'synth',
                           version='v1.0-mini', max_sweeps=0)

    pc_range = (-40.0, -30.0, -3.0, 40.0, 30.0, 5.0)
    model_cfg = PointPillarsConfig(
        point_cloud_range=pc_range,
        voxel_size=(1.0, 1.0, 8.0), max_voxels=1024,
        max_points_per_voxel=8, bev_hw=(60, 80), pfn_channels=(16,),
        second_channels=(16, 32, 32), fpn_channels=(16, 16, 16))
    train_ds = NewScenesDetDataset(
        ann_file=f'{out}/synth_infos_temporal_train.pkl', modality='radar',
        max_points=2000, max_gt=24, point_shuffle=True,
        pc_range=list(pc_range))
    eval_ds = NewScenesDetDataset(
        ann_file=f'{out}/synth_infos_temporal_train.pkl', modality='radar',
        max_points=2000, max_gt=24, test_mode=True,
        pc_range=list(pc_range))

    model = PointPillars(model_cfg)
    s0 = train_ds[0]
    variables = model.init(jax.random.PRNGKey(0), s0['points'][None],
                           s0['points_mask'][None], train=False)
    epochs = 350
    loader = TrainLoader(train_ds, 8, seed=0)
    tx = make_optimizer(make_lr_schedule(1e-2, len(loader) * epochs,
                                         warmup_iters=20))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(make_loss_fn(model), tx)
    for ep in range(epochs):
        loader.set_epoch(ep)
        for batch in loader:
            state, loss, _ = step_fn(state, batch)
    assert np.isfinite(float(loss))

    predict_fn = make_predict_fn(model, DecodeCfg(nms_pre=128, max_num=32))
    results = run_inference(predict_fn, state, eval_ds, 2)
    metrics = eval_ds.evaluate(results, dataroot=synthetic_dataroot,
                               version='v1.0-mini', eval_set='train_mini',
                               jsonfile_prefix=str(tmp_path / 'eval'))
    assert metrics['mAP'] > 0.5, metrics
    assert metrics['NOS'] > 0.45, metrics
