"""Database + converter tests against the synthetic dataset."""

import os.path as osp
import pickle

import numpy as np
import pytest

from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
from omnihd_scenes_tpu.utils.quaternion import Quaternion


class TestDatabase:
    def test_tables_loaded(self, synthetic_db):
        assert len(synthetic_db.sample) > 0
        assert len(synthetic_db.sample_data) == len(synthetic_db.sample)
        assert len(synthetic_db.annotations) == len(synthetic_db.sample)

    def test_get_reverse_index(self, synthetic_db):
        token = synthetic_db.sample[0]['token']
        rec = synthetic_db.get('sample', token)
        assert rec['token'] == token

    def test_scene_scoped_lookup(self, synthetic_db):
        sample = synthetic_db.sample[0]
        sd = synthetic_db.get('sample_data', sample['token'])
        pose_token = sd['ego_pose']['lidar_top_compensation']
        pose = synthetic_db.get('ego_pose', pose_token, sample['scene_token'])
        assert len(pose['pose']) == 16
        with pytest.raises(AssertionError):
            synthetic_db.get('ego_pose', pose_token)  # needs scene_token

    def test_annotation_boxes(self, synthetic_db):
        token = synthetic_db.sample[1]['token']  # middle frame: has prev+next
        boxes = synthetic_db.get_annotation_box(token)
        assert len(boxes) > 0
        for b in boxes:
            assert b.center.shape == (3,)
            assert b.wlh.shape == (3,)
            assert b.name is not None

    def test_velocity_estimation(self, synthetic_db):
        """Synthetic objects move at constant global velocity; centered
        finite differences must recover it (rotated into ego frame)."""
        sample = synthetic_db.sample[2]
        token = sample['token']
        sd = synthetic_db.get('sample_data', token)
        pose = np.array(synthetic_db.get(
            'ego_pose', sd['ego_pose']['lidar_top_compensation'],
            sample['scene_token'])['pose']).reshape(4, 4)

        vel_global = synthetic_db.box_velocity(token)
        boxes = synthetic_db.get_annotation_box(token)
        for b in boxes:
            vg = vel_global[b.track_id]
            if np.any(np.isnan(vg)):
                continue
            expected_ego = vg @ np.linalg.inv(pose)[:3, :3].T
            assert np.allclose(b.velocity, expected_ego, atol=1e-6)

    def test_wlh_reorder(self, synthetic_db):
        """Annotation size (x=len, y=wid, z=hgt) -> Box.wlh = (w, l, h)."""
        token = synthetic_db.sample[0]['token']
        raw = synthetic_db.get('annotations', token)['annotations'][0]
        box = synthetic_db.get_annotation_box(token)[0]
        assert np.isclose(box.wlh[0], raw['size']['y'])
        assert np.isclose(box.wlh[1], raw['size']['x'])
        assert np.isclose(box.wlh[2], raw['size']['z'])


class TestConverter:
    @pytest.fixture(scope='class')
    def infos(self, synthetic_dataroot, tmp_path_factory):
        out = tmp_path_factory.mktemp('infos')
        create_newscenes_infos(synthetic_dataroot, str(out), 'synth',
                               version='v1.0-mini', max_sweeps=2)
        with open(osp.join(str(out), 'synth_infos_temporal_train.pkl'), 'rb') as f:
            train = pickle.load(f)
        with open(osp.join(str(out), 'synth_infos_temporal_val.pkl'), 'rb') as f:
            val = pickle.load(f)
        return train, val

    def test_info_structure(self, infos):
        train, val = infos
        assert len(train['infos']) > 0 and len(val['infos']) > 0
        info = train['infos'][0]
        assert set(info['cams'].keys()) == {
            'camera_front', 'camera_left_front', 'camera_right_front',
            'camera_back', 'camera_left_back', 'camera_right_back'}
        assert set(info['radars'].keys()) == {
            'radar_front', 'radar_left_front', 'radar_right_front',
            'radar_back', 'radar_left_back', 'radar_right_back'}
        for sweeps in info['radars'].values():
            assert len(sweeps) == 3

    def test_can_bus_layout(self, infos):
        train, _ = infos
        cb = train['infos'][0]['can_bus']
        assert cb.shape == (18,)
        # Elements 3:7 are a unit quaternion.
        assert np.isclose(np.linalg.norm(cb[3:7]), 1.0, atol=1e-6)
        # Trailing 2 are padding.
        assert cb[16] == 0.0 and cb[17] == 0.0

    def test_cam_sensor2lidar_identity_chain(self, infos):
        """lidar2ego = identity and cam shares the lidar timestamp, so
        sensor2lidar must equal camera2ego exactly."""
        train, _ = infos
        info = train['infos'][0]
        cam = info['cams']['camera_front']
        cam2ego_r = Quaternion(cam['sensor2ego_rotation']).rotation_matrix
        assert np.allclose(cam['sensor2lidar_rotation'], cam2ego_r, atol=1e-9)
        assert np.allclose(cam['sensor2lidar_translation'],
                           cam['sensor2ego_translation'], atol=1e-9)

    def test_gt_second_convention(self, infos):
        """gt_boxes yaw = -box_yaw - pi/2 (SECOND convention)."""
        train, _ = infos
        info = train['infos'][0]
        assert info['gt_boxes'].shape[1] == 7
        assert info['gt_velocity'].shape == (len(info['gt_boxes']), 2)
        assert info['valid_flag'].dtype == bool

    def test_radar_sweep_timestamps_from_filename(self, infos):
        train, _ = infos
        sweep = train['infos'][0]['radars']['radar_front'][0]
        base = osp.basename(sweep['data_path'])
        assert sweep['timestamp'] == base[:-4]
