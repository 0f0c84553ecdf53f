"""Temporal dataset (union2one semantics), streaming state, checkpoint
remapping."""

import numpy as np
import pytest

from omnihd_scenes_tpu.data.temporal_dataset import (StreamingEvalState,
                                                     TemporalNewScenesDataset,
                                                     finalize_can_bus)
from omnihd_scenes_tpu.train.ckpt_remap import load_lift_from, remap_params


@pytest.fixture(scope='module')
def temporal_ds(synthetic_dataroot, tmp_path_factory):
    from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos

    out = str(tmp_path_factory.mktemp('tinfos'))
    create_newscenes_infos(synthetic_dataroot, out, 'synth',
                           version='v1.0-mini', max_sweeps=0)
    return TemporalNewScenesDataset(
        ann_file=f'{out}/synth_infos_temporal_train.pkl',
        queue_length=3, max_gt=16,
        image_scale=1.0, front_back_scale=1.0)


class TestTemporalDataset:
    def test_queue_shapes(self, temporal_ds):
        s = temporal_ds[4]
        q = 3
        assert s['imgs'].shape[0] == q
        assert s['imgs'].shape[1] == 6          # cameras
        assert s['can_bus'].shape == (q, 18)
        assert s['lidar2img'].shape[:2] == (q, 6)
        assert s['has_prev'].shape == (q,)

    def test_union2one_relative_canbus(self, temporal_ds):
        s = temporal_ds[4]
        # First frame in the scene queue: zeroed deltas, no prev.
        assert not s['has_prev'][0]
        assert np.allclose(s['can_bus'][0, :3], 0.0)
        assert s['can_bus'][0, -1] == 0.0
        # Later frames carry deltas and prev flags.
        assert s['has_prev'][1:].all()
        assert np.linalg.norm(s['can_bus'][1, :3]) > 0

    def test_frame0_clamps(self, temporal_ds):
        s = temporal_ds[0]   # queue indices clamp to 0 -> same frame
        # Same scene everywhere; frames after the first see "prev".
        assert not s['has_prev'][0]

    def test_finalize_can_bus_fields(self, temporal_ds):
        info = temporal_ds.infos[1]
        cb = finalize_can_bus(info)
        assert np.isclose(np.linalg.norm(cb[3:7]), 1.0, atol=1e-5)
        assert 0.0 <= cb[-1] < 360.0
        assert np.isclose(cb[-2], cb[-1] / 180.0 * np.pi)


class TestStreamingState:
    def test_scene_reset_and_deltas(self):
        st = StreamingEvalState((4, 8))
        cb1 = np.zeros(18)
        cb1[:3] = [10.0, 5.0, 0.0]
        cb1[-1] = 90.0
        rel, has_prev = st.prepare(cb1, 'sceneA')
        assert not has_prev
        assert np.allclose(rel[:3], 0.0) and rel[-1] == 0.0

        st.update(np.ones((4, 8)))
        cb2 = cb1.copy()
        cb2[:3] = [12.0, 5.0, 0.0]
        cb2[-1] = 95.0
        rel2, has_prev2 = st.prepare(cb2, 'sceneA')
        assert has_prev2
        assert np.allclose(rel2[:3], [2.0, 0.0, 0.0])
        assert np.isclose(rel2[-1], 5.0)

        # New scene resets.
        rel3, has_prev3 = st.prepare(cb2, 'sceneB')
        assert not has_prev3


class TestCkptRemap:
    def test_rename_and_drop(self):
        target = {'img_backbone': {'w': np.zeros((2, 2))},
                  'head': {'w': np.zeros((3,))}}
        source = {'backbone': {'w': np.ones((2, 2))},
                  'bbox_head': {'w': np.ones((3,))}}
        merged, report = remap_params(
            target, source, rename={'backbone': 'img_backbone'},
            drop_prefixes=('bbox_head',), verbose=False)
        assert np.all(merged['img_backbone']['w'] == 1.0)
        assert np.all(merged['head']['w'] == 0.0)   # untouched
        assert report['loaded'] == ['img_backbone/w']
        assert 'head/w' in report['missing']

    def test_shape_mismatch_kept_at_init(self):
        target = {'a': {'w': np.zeros((2, 2))}}
        source = {'a': {'w': np.ones((3, 3))}}
        merged, report = remap_params(target, source, verbose=False)
        assert np.all(merged['a']['w'] == 0.0)
        assert report['mismatched'] == ['a/w']

    def test_load_lift_from_drops_head(self):
        target = {'lss': {'w': np.zeros(2)}, 'det_head': {'w': np.zeros(2)}}
        source = {'lss': {'w': np.ones(2)}, 'det_head': {'w': np.ones(2)}}
        merged, _ = load_lift_from(target, source, verbose=False)
        assert np.all(merged['lss']['w'] == 1.0)
        assert np.all(merged['det_head']['w'] == 0.0)
