"""Golden numeric fixtures pinning reference conventions.

Each test hand-derives its expected values from the REFERENCE code's
formulas (cited inline), independent of this repo's implementations, so
silent convention drift (yaw sign, wlh order, can_bus layout, Doppler
algebra, AP interpolation) fails loudly.
"""

import os

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# 1. Radar Doppler compensation (reference loading.py:230-292)
# ---------------------------------------------------------------------------


def _rz90_quat():
    # yaw +90deg as (w, x, y, z)
    c = np.cos(np.pi / 4)
    return [c, 0.0, 0.0, np.sin(np.pi / 4)]


@pytest.mark.parametrize('use_native', [False, True])
def test_radar_sweep_golden_row(tmp_path, use_native):
    from omnihd_scenes_tpu.data.radar_loading import load_radar_sweep

    # Sensor frame point (3, 4, 0), vr=2; sensor yawed +90deg on an ego
    # moving at +10 m/s x.  Hand derivation:
    #   r=5, az=atan2(4,3) (cos=0.6, sin=0.8), el=0
    #   v_sensor = Rz(-90) @ (10,0,0) = (0, -10, 0)
    #   vr_comp  = 0*0.6 + (-10)*0.8 + 0 + 2      = -6
    #   vx,vy    = (-6*0.6, -6*0.8)               = (-3.6, -4.8)
    #   lidar velo = Rz(90) @ (vx, vy, 0)         = (4.8, -3.6)
    #   lidar xyz  = Rz(90) @ (3,4,0) + (1,2,0.5) = (-3, 5, 0.5)
    raw = np.array([[3, 4, 0, 2, 7.5, 1, 11.25, 1]], np.float32)
    path = str(tmp_path / f'sweep_{int(use_native)}.bin')
    raw.tofile(path)
    c = np.cos(np.pi / 2)
    s = np.sin(np.pi / 2)
    rz90 = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    sweep = {
        'data_path': path,
        'timestamp': 1_000_000,            # 1.0 s
        'sensor2ego_rotation': _rz90_quat(),
        'sensor2lidar_rotation': rz90,
        'sensor2lidar_translation': np.array([1.0, 2.0, 0.5]),
        'ego_velocity': [10.0, 0.0, 0.0],
    }
    out = load_radar_sweep(sweep, 'radar_left_front', ref_ts=1.25,
                           use_native=use_native)
    assert out.shape == (1, 10)
    want = np.array([[-3.0, 5.0, 0.5,          # lidar xyz
                      4.8, -3.6,               # compensated vx, vy
                      7.5, 11.25,              # power, snr
                      0.25,                    # time_diff = 1.25 - 1.0
                      -6.0,                    # Vr compensated
                      1.0]])                   # radar_left_front id
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. Converter conventions (reference newscenes_converter_final.py)
# ---------------------------------------------------------------------------


def test_converter_box_and_canbus_conventions(synthetic_dataroot,
                                              synthetic_db, tmp_path):
    import pickle

    from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos

    create_newscenes_infos(synthetic_dataroot, str(tmp_path), 'gold',
                           version='v1.0-mini', max_sweeps=2)
    with open(os.path.join(str(tmp_path),
                           'gold_infos_temporal_train.pkl'), 'rb') as f:
        data = pickle.load(f)
    infos = data['infos']
    assert infos, 'converter produced no train infos'

    checked_boxes = 0
    for info in infos:
        anns = synthetic_db.get('annotations', info['token'],
                                info['scene_token'])['annotations']
        centers = np.array([[a['center'][k] for k in 'xyz']
                            for a in anns])
        # Reference: gt yaw = -rotation.z - pi/2 (SECOND convention,
        # converter :258); dims wlh = (size.y, size.x, size.z)
        # (newscenes.py size reorder).  Match rows by nearest center.
        for g in range(info['gt_boxes'].shape[0]):
            box = info['gt_boxes'][g]
            d = np.linalg.norm(centers - box[:3], axis=1)
            if d.min() > 0.5:
                continue
            b = anns[int(d.argmin())]
            np.testing.assert_allclose(
                box[3:6],
                [b['size']['y'], b['size']['x'], b['size']['z']],
                rtol=1e-5)
            want_yaw = -b['rotation']['z'] - np.pi / 2
            diff = (box[6] - want_yaw + np.pi) % (2 * np.pi) - np.pi
            assert abs(diff) < 1e-5, (box[6], want_yaw)
            checked_boxes += 1

        # can_bus layout (converter :101-109): translation(3) quat(4)
        # acc(3) gyro(3) ego-vel(3) pad(2).
        can_bus = info['can_bus']
        assert can_bus.shape == (18,)
        sd = synthetic_db.get('sample_data', info['token'],
                              info['scene_token'])
        pose_token = sd['ego_pose']['lidar_top_compensation']
        ego = synthetic_db.get('ego_pose', pose_token,
                               info['scene_token'])
        imu = synthetic_db.get('imu_data', pose_token,
                               info['scene_token'])
        pose = np.asarray(ego['pose'], np.float64).reshape(4, 4)
        np.testing.assert_allclose(can_bus[:3], pose[:3, 3], atol=1e-6)
        np.testing.assert_allclose(can_bus[7:10], imu['acc_xyz'],
                                   atol=1e-6)
        np.testing.assert_allclose(can_bus[10:13], imu['gyro_xyz'],
                                   atol=1e-6)
        np.testing.assert_allclose(can_bus[13:16], imu['velocity_ego'],
                                   atol=1e-6)
        np.testing.assert_allclose(can_bus[16:18], 0.0)
        # Quaternion [w,x,y,z] of the pose rotation, w normalized >= 0.
        from omnihd_scenes_tpu.utils.quaternion import Quaternion
        q = Quaternion(matrix=pose[:3, :3]).elements
        if q[0] < 0:
            q = -q
        got = np.asarray(can_bus[3:7])
        if got[0] < 0:
            got = -got
        np.testing.assert_allclose(got, q, atol=1e-6)
    assert checked_boxes > 0


# ---------------------------------------------------------------------------
# 3. AP accumulation (reference eval/detection/algo.py:17-203)
# ---------------------------------------------------------------------------


def test_ap_hand_case():
    from omnihd_scenes_tpu.eval.common import EvalBoxes, center_distance
    from omnihd_scenes_tpu.eval.detection.algo import accumulate, calc_ap
    from omnihd_scenes_tpu.eval.detection.data_classes import DetectionBox

    def gt(tok, x, y):
        return DetectionBox(sample_token=tok, translation=(x, y, 0),
                            size=(2, 4, 1.5), rotation=(1, 0, 0, 0),
                            velocity=(0, 0), detection_name='car',
                            visibility=1)

    def pred(tok, x, y, score):
        return DetectionBox(sample_token=tok, translation=(x, y, 0),
                            size=(2, 4, 1.5), rotation=(1, 0, 0, 0),
                            velocity=(0, 0), detection_name='car',
                            detection_score=score)

    gts = EvalBoxes()
    preds = EvalBoxes()
    gts.add_boxes('s0', [gt('s0', 0, 0), gt('s0', 10, 0)])
    preds.add_boxes('s0', [pred('s0', 0.5, 0, 0.9),    # TP (d=0.5)
                           pred('s0', 30, 0, 0.8),     # FP (d=20 to gt2)
                           pred('s0', 10.5, 0, 0.7)])  # TP (d=0.5)
    md = accumulate(gts, preds, 'car', center_distance, dist_th=2.0,
                    verbose=False)
    # Hand curve: sorted by score -> [TP, FP, TP]
    #   recall    = [0.5, 0.5, 1.0]
    #   precision = [1.0, 0.5, 2/3]
    # 101-point interpolation (np.interp with right=0) then
    # calc_ap(min_recall=0.1, min_precision=0.1):
    rec_interp = np.linspace(0, 1, 101)
    prec_interp = np.interp(rec_interp, [0.5, 0.5, 1.0],
                            [1.0, 0.5, 2 / 3], right=0)
    expect_prec = prec_interp[11:] - 0.1
    expect_prec[expect_prec < 0] = 0
    want_ap = float(np.mean(expect_prec)) / 0.9
    got_ap = calc_ap(md, min_recall=0.1, min_precision=0.1)
    np.testing.assert_allclose(got_ap, want_ap, atol=1e-9)
    np.testing.assert_allclose(md.recall[-1], 1.0)


# ---------------------------------------------------------------------------
# 4. Dataset-level augmentation consistency (wired `aug=` config)
# ---------------------------------------------------------------------------


def test_dataset_aug_keeps_projection_consistent(synthetic_dataroot,
                                                 tmp_path):
    import pickle

    from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
    from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos

    create_newscenes_infos(synthetic_dataroot, str(tmp_path), 'aug',
                           version='v1.0-mini', max_sweeps=1)
    ann = str(tmp_path / 'aug_infos_temporal_train.pkl')
    aug = {'photometric': True,
           'rot_scale_flip_image': {'rot_range': (-10, 10),
                                    'scale_ratio_range': (0.9, 1.1)},
           'crop_resize_flip': {'resize': [128], 'crop': (0, 0, 480, 270),
                                'rand_flip': True}}
    ds = NewScenesDetDataset(ann_file=ann, modality='radar',
                             use_camera=True, max_points=512,
                             image_target_hw=None, aug=aug, seed=3)
    base = NewScenesDetDataset(ann_file=ann, modality='radar',
                               use_camera=True, max_points=512,
                               image_target_hw=None)
    s_aug, s_base = ds[0], base[0]
    assert s_aug['imgs'].shape[0] == s_base['imgs'].shape[0]
    assert not np.allclose(s_aug['gt_boxes'], s_base['gt_boxes'])
    # img2lidar must stay the exact inverse of lidar2img.
    prod = np.einsum('nij,njk->nik',
                     s_aug['lidar2img'].astype(np.float64)[:, :3, :3],
                     np.linalg.inv(
                         s_aug['lidar2img'].astype(np.float64))[:, :3, :3])
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-6)
    np.testing.assert_allclose(
        s_aug['img2lidar_rots'],
        np.linalg.inv(s_aug['lidar2img'].astype(np.float64)
                      )[:, :3, :3].astype(np.float32), atol=1e-5)
