"""Smaller components: beam reduction, chamfer, MM layer, eval render,
shell wrappers."""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.data.beam_reduction import (BEAM_RANGE_DEG,
                                                   reduce_lidar_beams)
from omnihd_scenes_tpu.ops.chamfer import chamfer_distance


class TestBeamReduction:
    def _cloud(self, n=20000):
        rng = np.random.RandomState(0)
        pts = np.zeros((n, 4), np.float32)
        r = rng.uniform(5, 60, n)
        az = rng.uniform(-np.pi, np.pi, n)
        el = np.radians(rng.choice(BEAM_RANGE_DEG, n))
        pts[:, 0] = r * np.cos(el) * np.cos(az) + 1.26
        pts[:, 1] = r * np.cos(el) * np.sin(az)
        pts[:, 2] = r * np.sin(el) + 1.855
        return pts

    def test_reduction_ratios(self):
        pts = self._cloud()
        n64 = len(reduce_lidar_beams(pts, 64))
        n32 = len(reduce_lidar_beams(pts, 32))
        n16 = len(reduce_lidar_beams(pts, 16))
        n4 = len(reduce_lidar_beams(pts, 4))
        assert n64 > n32 > n16 > n4 > 0
        # Roughly proportional to beam counts.
        assert 0.3 < n64 / len(pts) < 0.7
        assert n4 / len(pts) < 0.1

    def test_feature_columns_preserved(self):
        pts = self._cloud(1000)
        pts[:, 3] = 7.0
        out = reduce_lidar_beams(pts, 32)
        assert np.allclose(out[:, 3], 7.0)


class TestChamfer:
    def test_identical_clouds_zero(self):
        a = jnp.asarray(np.random.RandomState(0).randn(100, 3))
        d_ab, d_ba = chamfer_distance(a, a)
        assert float(d_ab) < 1e-9 and float(d_ba) < 1e-9

    def test_known_offset(self):
        a = jnp.zeros((4, 3))
        b = jnp.ones((4, 3))
        d_ab, d_ba = chamfer_distance(a, b)
        assert np.isclose(float(d_ab), 3.0)

    def test_chunking(self):
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.randn(100, 3))
        b = jnp.asarray(rng.randn(77, 3))
        d1 = chamfer_distance(a, b, chunk=16)
        d2 = chamfer_distance(a, b, chunk=4096)
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


class TestMMLayer:
    @pytest.mark.slow
    def test_fusion_layer_forward(self):
        from omnihd_scenes_tpu.models.bevformer.encoder import (
            MMBEVFormerLayer, get_reference_points_2d)

        nq, c = 48, 32
        layer = MMBEVFormerLayer(embed_dims=c, num_heads=4, num_cams=2,
                                 feedforward_channels=64)
        rng = np.random.RandomState(0)
        bev_q = rng.randn(nq, c).astype(np.float32)
        bev_pos = rng.randn(nq, c).astype(np.float32)
        value_q = np.stack([bev_q, bev_q])
        ref2d = np.asarray(get_reference_points_2d(6, 8))
        ref_queue = np.stack([ref2d, ref2d])
        cam_values = rng.randn(2, 24, c).astype(np.float32)
        ref_cam = rng.uniform(0.2, 0.8, (2, nq, 4, 2)).astype(np.float32)
        bev_mask = np.ones((2, nq, 4), bool)
        lidar_bev = rng.randn(nq, 16).astype(np.float32)

        variables = layer.init(jax.random.PRNGKey(0), bev_q, bev_pos,
                               value_q, ref_queue, cam_values, ref_cam,
                               bev_mask, ((6, 8),), ((4, 6),), lidar_bev)
        out = layer.apply(variables, bev_q, bev_pos, value_q, ref_queue,
                          cam_values, ref_cam, bev_mask, ((6, 8),),
                          ((4, 6),), lidar_bev)
        assert out.shape == (nq, c)
        assert np.all(np.isfinite(np.asarray(out)))


class TestVisualizeSample:
    def test_renders_png(self, synthetic_db, tmp_path):
        from omnihd_scenes_tpu.eval.common import load_gt
        from omnihd_scenes_tpu.eval.detection.data_classes import DetectionBox
        from omnihd_scenes_tpu.eval.detection.render import visualize_sample

        gt = load_gt(synthetic_db, 'val_mini', DetectionBox, verbose=False)
        token = gt.sample_tokens[0]
        preds = gt  # GT as predictions with score -1 -> below conf, fine
        out = tmp_path / 'sample.png'
        visualize_sample(synthetic_db, token, gt, preds,
                         savepath=str(out))
        assert out.exists() and out.stat().st_size > 1000


class TestShellWrappers:
    def test_scripts_exist_and_reference_clis(self):
        root = osp.dirname(osp.dirname(osp.abspath(__file__)))
        for name, module in (('dist_train.sh', 'tools.train'),
                             ('dist_test.sh', 'tools.test')):
            path = osp.join(root, 'tools', name)
            assert osp.exists(path)
            assert module in open(path).read()


def test_make_predict_fn_generic_returns_callable_all_families():
    """Regression: the anchor-family branch of make_predict_fn_generic
    was once displaced into make_predict_stream_batched as dead code,
    making tools/test.py eval crash with a None predict fn."""
    from omnihd_scenes_tpu.train.builder import make_predict_fn_generic
    from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                    PointPillarsConfig)

    cfg = PointPillarsConfig(
        point_cloud_range=(-10, -10, -3.0, 10, 10, 5.0),
        voxel_size=(2.0, 2.0, 8.0), max_voxels=64,
        max_points_per_voxel=4, bev_hw=(10, 10),
        pfn_channels=(8,), second_channels=(8, 8, 8),
        fpn_channels=(8, 8, 8))
    model = PointPillars(cfg)
    fn = make_predict_fn_generic(model, 'pointpillars', cfg.anchors())
    assert callable(fn)

    import numpy as np

    rng = np.random.RandomState(0)
    pts = rng.uniform(-9, 9, (1, 64, 8)).astype(np.float32)
    batch = {'points': pts, 'points_mask': np.ones((1, 64), bool)}
    import jax

    variables = model.init(jax.random.PRNGKey(0), pts,
                           batch['points_mask'], train=False)
    dets, occ = fn(variables['params'],
                   variables.get('batch_stats', {}), batch)
    boxes, scores, labels, valid = dets
    assert boxes.shape[0] == 1 and occ is None


class TestCheckpointPathDetection:
    """load_checkpoint recognizes a specific checkpoint by orbax
    metadata, not by directory name (ADVICE r3): an empty dir named
    ckpt_N must fail with the clear 'no checkpoints' assert, and a
    direct checkpoint path must not accept an extra explicit step."""

    def _state(self):
        import optax
        from omnihd_scenes_tpu.train.loop import create_train_state
        variables = {'params': {'w': np.arange(4.0, dtype=np.float32)}}
        return create_train_state(variables, optax.sgd(0.1))

    def test_roundtrip_dir_and_direct_path(self, tmp_path):
        from omnihd_scenes_tpu.train.loop import (load_checkpoint,
                                                  save_checkpoint)
        state = self._state()
        ckpt_dir = str(tmp_path / 'work')
        os.makedirs(ckpt_dir)
        save_checkpoint(ckpt_dir, state, step=7)
        # Latest-in-dir restore.
        r1 = load_checkpoint(ckpt_dir, state)
        np.testing.assert_array_equal(np.asarray(r1.params['w']),
                                      np.arange(4.0))
        # Direct checkpoint path restore (the --resume-from form).
        r2 = load_checkpoint(os.path.join(ckpt_dir, 'ckpt_7'), state)
        np.testing.assert_array_equal(np.asarray(r2.params['w']),
                                      np.arange(4.0))
        # Direct path + explicit step is contradictory.
        with pytest.raises(AssertionError, match='itself a checkpoint'):
            load_checkpoint(os.path.join(ckpt_dir, 'ckpt_7'), state,
                            step=3)

    def test_empty_ckpt_named_dir_fails_clearly(self, tmp_path):
        from omnihd_scenes_tpu.train.loop import load_checkpoint
        empty = tmp_path / 'ckpt_42'
        empty.mkdir()
        with pytest.raises(AssertionError, match='no checkpoints'):
            load_checkpoint(str(empty), self._state())
