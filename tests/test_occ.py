"""Occupancy head, segmentation losses, MTL detector, occ eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.eval.occupancy import (evaluation_semantic,
                                              summarize_occ_scores)
from omnihd_scenes_tpu.models.occ_head import (BEVOCCHead2D, geo_scal_loss,
                                               lovasz_softmax_loss,
                                               occ_head_loss, sem_scal_loss)


class TestOccHead:
    def test_output_shape(self):
        head = BEVOCCHead2D(out_dim=32, dz=4, num_classes=5)
        bev = np.random.RandomState(0).randn(1, 8, 12, 16).astype(np.float32)
        variables = head.init(jax.random.PRNGKey(0), bev)
        out = head.apply(variables, bev)
        # (B, Dx, Dy, Dz, n_cls): Dy/Dx swapped by the head transpose.
        assert out.shape == (1, 12, 8, 4, 5)


class TestSegLosses:
    def _case(self):
        rng = np.random.RandomState(0)
        target = rng.randint(0, 4, (6, 5, 3)).astype(np.int32)
        perfect = jax.nn.one_hot(target, 4) * 20.0 - 10.0
        noise = jnp.asarray(rng.randn(6, 5, 3, 4).astype(np.float32))
        return jnp.asarray(perfect), noise, jnp.asarray(target)

    def test_ce_and_scal_losses_near_zero_for_perfect(self):
        perfect, _, target = self._case()
        losses = occ_head_loss(perfect, target)
        assert float(losses['loss_occ']) < 1e-3
        assert float(losses['loss_ssc']) < 0.01

    def test_losses_positive_for_noise(self):
        _, noise, target = self._case()
        losses = occ_head_loss(noise, target)
        assert float(losses['loss_occ']) > 0.5
        assert float(losses['loss_ssc']) > 0.5

    def test_unknown_voxels_masked(self):
        perfect, _, target = self._case()
        target255 = target.at[0, 0, 0].set(255)
        losses = occ_head_loss(perfect, target255)
        assert np.isfinite(float(losses['loss_occ']))
        assert float(losses['loss_occ']) < 1e-3

    def test_lovasz_perfect_low(self):
        perfect, noise, target = self._case()
        lp = float(lovasz_softmax_loss(perfect, target))
        ln = float(lovasz_softmax_loss(noise, target))
        assert lp < 0.01
        assert ln > lp

    def test_geo_scal_discriminates(self):
        target = jnp.zeros((4, 4, 2), jnp.int32).at[0, 0, 0].set(1)
        good = jax.nn.one_hot(target, 3) * 20.0
        # All-empty prediction: predicts free everywhere.
        bad = jnp.zeros((4, 4, 2, 3)).at[..., 0].set(20.0)
        assert float(geo_scal_loss(good, target)) \
            < float(geo_scal_loss(bad, target))


class TestOccEval:
    def test_perfect_prediction_iou_one(self):
        rng = np.random.RandomState(0)
        gt = rng.randint(0, 5, (10, 8, 4))
        score = evaluation_semantic(gt, gt, 5)
        summary = summarize_occ_scores([score],
                                       class_names=['a', 'b', 'c', 'd'])
        assert summary['IoU'] == 1.0
        assert summary['mIoU'] == 1.0

    def test_empty_prediction(self):
        rng = np.random.RandomState(0)
        gt = rng.randint(1, 5, (10, 8, 4))
        pred = np.zeros_like(gt)
        score = evaluation_semantic(pred, gt, 5)
        summary = summarize_occ_scores([score],
                                       class_names=['a', 'b', 'c', 'd'])
        assert summary['IoU'] == 0.0
        assert summary['mIoU'] == 0.0

    def test_matches_reference_formula(self):
        """IoU computed from averaged score matrices, not per-sample."""
        gt1 = np.zeros((4, 4, 1), int)
        gt1[0, 0] = 1
        pred1 = np.zeros_like(gt1)
        pred1[0, 0] = 1
        pred1[1, 1] = 1   # one FP
        s1 = evaluation_semantic(pred1, gt1, 2)
        s2 = evaluation_semantic(gt1, gt1, 2)    # perfect second sample
        summary = summarize_occ_scores([s1, s2], class_names=['a'])
        # Averaged: tp=1, g=1, p=1.5 -> IoU = 1/1.5.
        assert np.isclose(summary['a'], 1 / 1.5)


class TestMTLDetector:
    def test_forward_shapes(self):
        from omnihd_scenes_tpu.models.mtl import BEVFusionMTL, MTLConfig
        from tests.test_bevfusion import TINY_FUSION, _inputs

        cfg = MTLConfig(fusion=TINY_FUSION, occ_classes=5, occ_dz=4)
        model = BEVFusionMTL(cfg)
        pts, pmask, imgs, rots, trans = _inputs()
        variables = model.init(jax.random.PRNGKey(0), pts, pmask, imgs,
                               rots, trans, train=False)
        out = model.apply(variables, pts, pmask, imgs, rots, trans,
                          train=False)
        assert 'cls_score' in out and 'occ_logits' in out
        b, dy, dx, _ = np.asarray(out['bev']).shape
        assert out['occ_logits'].shape == (b, dx, dy, 4, 5)

    def test_trunk_mode_param_trees(self):
        """Pin the task-trunk structure per mode against the reference
        head generations (mtl_occ_det_headv2.py: no trunks;
        mtl_occ_det_head.py:74-90 per-task; :61-73 shared)."""
        from omnihd_scenes_tpu.models.mtl import BEVFusionMTL, MTLConfig
        from tests.test_bevfusion import TINY_FUSION, _inputs

        pts, pmask, imgs, rots, trans = _inputs()

        def tops(mode):
            cfg = MTLConfig(fusion=TINY_FUSION, occ_classes=5, occ_dz=4,
                            trunk_mode=mode)
            v = BEVFusionMTL(cfg).init(jax.random.PRNGKey(0), pts, pmask,
                                       imgs, rots, trans, train=False)
            return set(v['params'].keys())

        none = tops('none')
        # v2 (shipped OCC config): decoders straight off the fused BEV —
        # no BevEncode trunk anywhere; det served by the fusion's head.
        assert 'occ_head' in none
        assert not any('trunk' in k or k == 'det_head' for k in none)

        per_task = tops('per_task')
        # v1 default: one trunk per enabled task + MTL-owned det head;
        # the fusion's built-in Anchor3DHead is dropped.
        assert {'det_trunk', 'occ_trunk', 'det_head',
                'occ_head'} <= per_task
        assert 'shared_trunk' not in per_task

        shared = tops('shared')
        assert 'shared_trunk' in shared and 'det_head' in shared
        assert not any(k in shared for k in ('det_trunk', 'occ_trunk'))

        # The fusion trunk itself is mode-independent (checkpoints for
        # the backbone remain interchangeable across modes) except for
        # its built-in head.
        def fusion_tops(mode_tree):
            # same init -> inspect fusion subtree keys
            return mode_tree
        assert 'fusion' in none and 'fusion' in per_task

    def test_trunk_mode_validation(self):
        from omnihd_scenes_tpu.models.mtl import MTLConfig
        import pytest
        with pytest.raises(ValueError):
            MTLConfig(trunk_mode='both')

    def test_slicer_identity_when_grids_equal(self):
        """grid_conf == occ_grid_conf (the shipped config,
        bevfusion_occ.py:9-21) must be a true identity."""
        from omnihd_scenes_tpu.models.mtl import BEVFusionMTL, MTLConfig
        from tests.test_bevfusion import TINY_FUSION, _inputs

        g = ((-60.0, 60.0, 0.5), (-40.0, 40.0, 0.5))
        pts, pmask, imgs, rots, trans = _inputs()
        base = MTLConfig(fusion=TINY_FUSION, occ_classes=5, occ_dz=4)
        withg = MTLConfig(fusion=TINY_FUSION, occ_classes=5, occ_dz=4,
                          grid_conf=g, det_grid_conf=g, occ_grid_conf=g)
        v = BEVFusionMTL(base).init(jax.random.PRNGKey(0), pts, pmask,
                                    imgs, rots, trans, train=False)
        o1 = BEVFusionMTL(base).apply(v, pts, pmask, imgs, rots, trans,
                                      train=False)
        o2 = BEVFusionMTL(withg).apply(v, pts, pmask, imgs, rots, trans,
                                       train=False)
        np.testing.assert_array_equal(np.asarray(o1['occ_logits']),
                                      np.asarray(o2['occ_logits']))
