"""End-to-end training slice on the synthetic dataset: data pipeline ->
jitted train steps on the 8-device CPU mesh -> inference -> devkit eval.
This is the radar-PointPillars minimum slice (SURVEY.md §7 stage 3)."""

import os
import os.path as osp

import jax
import numpy as np
import pytest

from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
from omnihd_scenes_tpu.data.loader import EvalLoader, TrainLoader
from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                PointPillarsConfig)
from omnihd_scenes_tpu.parallel.mesh import make_mesh, shard_batch
from omnihd_scenes_tpu.train.detection import (make_loss_fn, make_predict_fn,
                                               run_inference)
from omnihd_scenes_tpu.train.loop import create_train_state, make_train_step
from omnihd_scenes_tpu.train.optim import make_lr_schedule, make_optimizer

TINY_MODEL = PointPillarsConfig(
    point_cloud_range=(-60, -40, -3.0, 60, 40, 5.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_voxels=1024,
    max_points_per_voxel=8,
    bev_hw=(80, 120),
    pfn_channels=(32,),
    second_channels=(32, 32, 64),
    fpn_channels=(32, 32, 32),
)


@pytest.fixture(scope='module')
def infos_dir(synthetic_dataroot, tmp_path_factory):
    out = str(tmp_path_factory.mktemp('infos'))
    create_newscenes_infos(synthetic_dataroot, out, 'synth',
                           version='v1.0-mini', max_sweeps=2)
    return out


@pytest.fixture(scope='module')
def datasets(infos_dir):
    train = NewScenesDetDataset(
        ann_file=osp.join(infos_dir, 'synth_infos_temporal_train.pkl'),
        modality='radar', max_points=2048, max_gt=16, point_shuffle=True)
    val = NewScenesDetDataset(
        ann_file=osp.join(infos_dir, 'synth_infos_temporal_val.pkl'),
        modality='radar', max_points=2048, max_gt=16, test_mode=True)
    return train, val


class TestDataset:
    def test_sample_shapes(self, datasets):
        train, _ = datasets
        s = train[0]
        assert s['points'].shape == (2048, 8)
        assert s['points_mask'].shape == (2048,)
        assert s['gt_boxes'].shape == (16, 9)
        assert s['gt_mask'].any()

    def test_radar_points_in_range(self, datasets):
        train, _ = datasets
        s = train[0]
        pts = s['points'][s['points_mask']]
        assert np.all(np.abs(pts[:, 0]) <= 60)
        assert np.all(np.abs(pts[:, 1]) <= 40)

    def test_loader_batching(self, datasets):
        train, _ = datasets
        loader = TrainLoader(train, 4, seed=0)
        batch = next(iter(loader))
        assert batch['points'].shape == (4, 2048, 8)

    def test_eval_loader_covers_all(self, datasets):
        _, val = datasets
        loader = EvalLoader(val, 3)
        seen = []
        for batch, valid in loader:
            seen.extend(batch['index'][valid].tolist())
        assert sorted(seen) == list(range(len(val)))


class TestTraining:
    @pytest.mark.slow
    def test_loss_decreases_and_eval_runs(self, datasets, synthetic_dataroot,
                                          tmp_path):
        train_ds, val_ds = datasets
        mesh = make_mesh()
        assert mesh.devices.size == 8  # virtual CPU mesh

        model = PointPillars(TINY_MODEL)
        sample = train_ds[0]
        variables = model.init(jax.random.PRNGKey(0),
                               sample['points'][None],
                               sample['points_mask'][None], train=False)

        schedule = make_lr_schedule(3e-3, 40, policy='cosine',
                                    warmup_iters=5)
        tx = make_optimizer(schedule)
        state = create_train_state(variables, tx)
        loss_fn = make_loss_fn(model)
        train_step = make_train_step(loss_fn, tx)

        loader = TrainLoader(train_ds, 8, seed=0)
        losses = []
        for epoch in range(6):
            loader.set_epoch(epoch)
            for batch in loader:
                batch = shard_batch(batch, mesh)
                state, loss, aux = train_step(state, batch)
                losses.append(float(loss))
        assert np.isfinite(losses).all()
        # Optimization must make real progress on the tiny set.
        assert np.mean(losses[-3:]) < 0.7 * np.mean(losses[:3]), losses

        # Inference + devkit eval end-to-end (small decode budget: the
        # virtual CPU mesh has one physical core).
        from omnihd_scenes_tpu.models.anchor_head import DecodeCfg
        predict_fn = make_predict_fn(model, DecodeCfg(nms_pre=128,
                                                      max_num=32))
        results = run_inference(predict_fn, state, val_ds, 2, mesh)
        assert all(r is not None for r in results)
        metrics = val_ds.evaluate(
            results, dataroot=synthetic_dataroot, version='v1.0-mini',
            eval_set='val_mini', jsonfile_prefix=str(tmp_path))
        assert 'mAP' in metrics and 'NOS' in metrics
        assert 0.0 <= metrics['mAP'] <= 1.0
        assert os.path.exists(tmp_path / 'results_newsc.json')
