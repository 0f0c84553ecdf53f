"""Fast serving decode path vs the reference-parity slow path.

The fast path (``data/image_loading.py:_load_cam_fast``) replaces
{full-res JPEG decode, full-res undistort remap, per-stage resizes,
full-res normalize} with {reduced-res DCT-domain JPEG decode, ONE
output-sized fused undistort+rescale remap, small normalize}.  Both
compute the same linear-resampling pipeline composed differently, so
they must agree closely (not bitwise: the JPEG decoder's DCT box
downscale is a slightly different low-pass than cv2's INTER_LINEAR).

Reference behavior being preserved:
``datasets/pipelines/loading.py:320-407`` (undistort + front/back
halving) + ``transform_3d.py`` normalize/scale/pad.
"""

import numpy as np
import pytest

from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
from omnihd_scenes_tpu.devkit.synthetic import SyntheticConfig, generate


@pytest.fixture(scope='module')
def distorted_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('newscenes_dist'))
    generate(root, version='v1.0-mini',
             cfg=SyntheticConfig(n_scenes=1, samples_per_scene=2,
                                 image_hw=(216, 384),
                                 cam_distortion=(-0.3, 0.1, 0.0, 0.0,
                                                 0.0)))
    create_newscenes_infos(root, root, 'synth', version='v1.0-mini',
                           max_sweeps=1)
    return root


def _make(root, fast):
    return NewScenesDetDataset(
        ann_file=f'{root}/synth_infos_temporal_train.pkl',
        modality='radar', max_points=512, radar_sweeps=1,
        use_camera=True, test_mode=True, image_fast_decode=fast)


def test_fast_decode_agrees_with_slow(distorted_root):
    slow = _make(distorted_root, fast=False)[0]
    fast = _make(distorted_root, fast=True)[0]

    assert fast['imgs'].shape == slow['imgs'].shape
    # lidar2img: folding one net scale vs two exact-binary 0.5 stages
    # is bit-identical.
    np.testing.assert_array_equal(fast['lidar2img'], slow['lidar2img'])

    a, b = slow['imgs'], fast['imgs']
    # Normalized units (std ~58 gray levels): mean abs diff well under
    # a tenth of a unit, and near-perfect correlation.
    mad = float(np.mean(np.abs(a - b)))
    assert mad < 0.10, mad
    # 0.99 floor: synthetic images are all hard edges, the worst case
    # for DCT-vs-bilinear low-pass disagreement (measured 0.9926 here;
    # photographic content correlates tighter).
    corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    assert corr > 0.99, corr


def test_fast_decode_no_distortion_pure_reduced(distorted_root,
                                                tmp_path_factory):
    # Zero-distortion rig: the fast path is reduced decode + resize
    # only; agreement should be at least as tight.
    root = str(tmp_path_factory.mktemp('newscenes_nodist'))
    generate(root, version='v1.0-mini',
             cfg=SyntheticConfig(n_scenes=1, samples_per_scene=2,
                                 image_hw=(216, 384)))
    create_newscenes_infos(root, root, 'synth', version='v1.0-mini',
                           max_sweeps=1)
    slow = _make(root, fast=False)[0]
    fast = _make(root, fast=True)[0]
    assert fast['imgs'].shape == slow['imgs'].shape
    mad = float(np.mean(np.abs(slow['imgs'] - fast['imgs'])))
    assert mad < 0.10, mad
