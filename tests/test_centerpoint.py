"""CenterPoint head: target building, losses, decode round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.centerpoint_head import (CenterHead,
                                                       CenterTargetCfg,
                                                       build_center_targets,
                                                       center_head_decode,
                                                       center_head_loss,
                                                       gaussian_focal_loss)

CFG = CenterTargetCfg(pc_range=(-8, -8, -3.0, 8, 8, 5.0), out_hw=(16, 16))


def _gt():
    boxes = jnp.array([
        [1.0, 2.0, -0.5, 2.0, 4.0, 1.5, 0.3, 0.5, 0.0],
        [-4.0, -3.0, -0.4, 1.8, 4.2, 1.6, -0.7, 0.0, 0.0],
    ])
    labels = jnp.array([0, 2], jnp.int32)
    mask = jnp.array([True, True])
    return boxes, labels, mask


class TestTargets:
    def test_heatmap_peaks(self):
        boxes, labels, mask = _gt()
        tgt = build_center_targets(boxes, labels, mask, CFG)
        hm = np.asarray(tgt['heatmap'])
        assert hm.shape == (16, 16, 4)
        # Peak at each GT's cell in its class channel.
        gy, gx = np.asarray(tgt['gy']), np.asarray(tgt['gx'])
        assert hm[gy[0], gx[0], 0] > 0.95
        assert hm[gy[1], gx[1], 2] > 0.95
        # Other classes stay empty.
        assert hm[..., 1].max() < 0.05

    def test_invalid_gt_excluded(self):
        boxes, labels, _ = _gt()
        tgt = build_center_targets(boxes, labels, jnp.array([True, False]),
                                   CFG)
        assert np.asarray(tgt['heatmap'])[..., 2].max() == 0.0


class TestLossDecode:
    def test_perfect_predictions_low_loss(self):
        boxes, labels, mask = _gt()
        tgt = build_center_targets(boxes, labels, mask, CFG)
        heat_logits = jnp.log(jnp.clip(tgt['heatmap'], 1e-6, 1 - 1e-6)) \
            - jnp.log(1 - jnp.clip(tgt['heatmap'], 1e-6, 1 - 1e-6))
        reg_full = jnp.zeros((16, 16, 10))
        reg_full = reg_full.at[tgt['gy'], tgt['gx']].set(tgt['targets'])
        preds = {'heatmap': heat_logits,
                 'reg': reg_full[..., 0:2], 'height': reg_full[..., 2:3],
                 'dim': reg_full[..., 3:6], 'rot': reg_full[..., 6:8],
                 'vel': reg_full[..., 8:10]}
        losses = center_head_loss(preds, boxes, labels, mask, CFG)
        assert float(losses['loss_bbox']) < 1e-5
        assert float(losses['loss_heatmap']) < 0.5  # neg-penalty residue

        out_boxes, scores, cls, valid = center_head_decode(preds, CFG,
                                                           max_num=8)
        top2 = np.argsort(-np.asarray(scores))[:2]
        got = sorted(zip(np.asarray(cls)[top2].tolist(),
                         np.asarray(out_boxes)[top2, 0].tolist()))
        assert got[0][0] == 0 and abs(got[0][1] - 1.0) < 0.51
        assert got[1][0] == 2 and abs(got[1][1] + 4.0) < 0.51

    def test_head_forward_shapes(self):
        head = CenterHead(num_classes=4)
        bev = np.random.RandomState(0).randn(1, 16, 16, 32).astype(
            np.float32)
        variables = head.init(jax.random.PRNGKey(0), bev, train=False)
        out = head.apply(variables, bev, train=False)
        assert out['heatmap'].shape == (1, 16, 16, 4)
        assert out['dim'].shape == (1, 16, 16, 3)

    def test_focal_loss_discriminates(self):
        gt = jnp.zeros((8, 8, 1)).at[4, 4, 0].set(1.0)
        good = jnp.full((8, 8, 1), -8.0).at[4, 4, 0].set(8.0)
        bad = jnp.full((8, 8, 1), 8.0)
        assert float(gaussian_focal_loss(good, gt)) \
            < float(gaussian_focal_loss(bad, gt))
