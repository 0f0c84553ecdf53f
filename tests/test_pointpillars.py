"""PointPillars model: forward shapes, target assignment, loss sanity,
decode round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.anchor_head import (HeadLossConfig, DecodeCfg,
                                                  anchor_head_get_bboxes,
                                                  anchor_head_loss)
from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                PointPillarsConfig)
from omnihd_scenes_tpu.models.target_assign import assign_targets

# Tiny config so CPU tests stay fast.
TINY = PointPillarsConfig(
    point_cloud_range=(-8, -8, -3.0, 8, 8, 5.0),
    voxel_size=(0.5, 0.5, 8.0),
    max_voxels=256,
    max_points_per_voxel=8,
    bev_hw=(32, 32),
    second_channels=(32, 32, 64),
    fpn_channels=(32, 32, 32),
    anchor_ranges=((-8, -8, 0.0, 8, 8, 0.0),) * 4,
)


@pytest.fixture(scope='module')
def model_and_params():
    model = PointPillars(TINY)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-8, 8, size=(2, 512, 8)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 4, size=(2, 512))
    mask = np.ones((2, 512), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    return model, variables, pts, mask


class TestForward:
    def test_output_shapes(self, model_and_params):
        model, variables, pts, mask = model_and_params
        out = model.apply(variables, pts, mask, train=False)
        h, w = TINY.head_hw
        assert out['cls_score'].shape == (2, h, w, TINY.num_anchors * 4)
        assert out['bbox_pred'].shape == (2, h, w, TINY.num_anchors * 9)
        assert out['dir_pred'].shape == (2, h, w, TINY.num_anchors * 2)

    def test_jit_and_batch_stats(self, model_and_params):
        model, variables, pts, mask = model_and_params
        fwd = jax.jit(lambda v, p, m: model.apply(
            v, p, m, train=True, mutable=['batch_stats']))
        out, updates = fwd(variables, pts, mask)
        assert 'batch_stats' in updates
        assert np.all(np.isfinite(np.asarray(out['cls_score'])))


def _gt(x, y, yaw=0.0, w=2.0, l=4.0, h=1.5, z=-0.5):
    return [x, y, z, w, l, h, yaw, 0.0, 0.0]


class TestAssign:
    def _anchors(self):
        return TINY.anchors().reshape(-1, 9)

    def test_gt_forcing(self):
        anchors = jnp.asarray(self._anchors())
        gt = jnp.array([_gt(0.25, 0.25)])
        labels = jnp.array([0])
        mask = jnp.array([True])
        tgt = assign_targets(anchors, gt, labels, mask, 4)
        # At least the best anchor is positive even if IoU < 0.6.
        assert int(tgt.num_pos) >= 1
        pos = np.asarray(tgt.bbox_weights) > 0
        assert np.all(np.asarray(tgt.labels)[pos] == 0)

    def test_invalid_gt_ignored(self):
        anchors = jnp.asarray(self._anchors())
        gt = jnp.array([_gt(0.25, 0.25)])
        tgt = assign_targets(anchors, gt, jnp.array([0]),
                             jnp.array([False]), 4)
        assert int(tgt.num_pos) == 0
        assert np.all(np.asarray(tgt.labels) == 4)  # all background

    def test_background_weights(self):
        anchors = jnp.asarray(self._anchors())
        gt = jnp.array([_gt(0.0, 0.0)])
        tgt = assign_targets(anchors, gt, jnp.array([2]), jnp.array([True]), 4)
        # Anchors far away must be negatives with weight 1.
        far = np.abs(np.asarray(anchors)[:, 0]) > 6
        assert np.all(np.asarray(tgt.label_weights)[far] == 1.0)
        assert np.all(np.asarray(tgt.labels)[far] == 4)


class TestLossAndDecode:
    def test_perfect_prediction_low_loss(self):
        """Head outputs constructed from GT targets -> near-zero losses."""
        h, w = TINY.head_hw
        anchors = jnp.asarray(TINY.anchors())
        gt = jnp.array([_gt(0.25, 0.25), _gt(-3.0, 2.0, yaw=0.5)])
        labels = jnp.array([0, 2])
        mask = jnp.array([True, True])

        from omnihd_scenes_tpu.models.target_assign import assign_targets as at
        tgt = at(anchors.reshape(-1, 9), gt, labels, mask, 4)

        # Build ideal predictions.
        cls_logit = jnp.where(
            jax.nn.one_hot(tgt.labels, 5)[:, :4] > 0, 12.0, -12.0)
        bbox_pred = tgt.bbox_targets
        dir_pred = jax.nn.one_hot(tgt.dir_targets, 2) * 12.0

        losses = anchor_head_loss(
            cls_logit.reshape(h, w, -1), bbox_pred.reshape(h, w, -1),
            dir_pred.reshape(h, w, -1), anchors, gt, labels, mask)
        assert float(losses['loss_cls']) < 1e-2
        assert float(losses['loss_bbox']) < 1e-5
        assert float(losses['loss_dir']) < 1e-4

    @pytest.mark.slow
    def test_decode_recovers_gt(self):
        """get_bboxes on ideal predictions returns the GT boxes."""
        h, w = TINY.head_hw
        anchors = jnp.asarray(TINY.anchors())
        gt = jnp.array([_gt(0.25, 0.25), _gt(-3.0, 2.0, yaw=0.4)])
        labels = jnp.array([0, 2])
        mask = jnp.array([True, True])

        tgt = assign_targets(anchors.reshape(-1, 9), gt, labels, mask, 4)
        cls_logit = jnp.where(
            jax.nn.one_hot(tgt.labels, 5)[:, :4] > 0, 8.0, -8.0)
        dir_pred = jax.nn.one_hot(tgt.dir_targets, 2) * 8.0

        boxes, scores, out_labels, valid = anchor_head_get_bboxes(
            cls_logit.reshape(h, w, -1),
            tgt.bbox_targets.reshape(h, w, -1),
            dir_pred.reshape(h, w, -1), anchors,
            DecodeCfg(nms_pre=256, max_num=16))

        valid = np.asarray(valid)
        boxes = np.asarray(boxes)[valid]
        out_labels = np.asarray(out_labels)[valid]
        assert valid.sum() == 2
        got = sorted(zip(out_labels.tolist(), boxes[:, 0].tolist()))
        assert got[0][0] == 0 and abs(got[0][1] - 0.25) < 1e-3
        assert got[1][0] == 2 and abs(got[1][1] + 3.0) < 1e-3
        # Yaw recovered through the sin-diff + dir-bin path.
        yaw = boxes[np.argsort(out_labels)][1, 6]
        assert abs((yaw - 0.4 + np.pi) % (2 * np.pi) - np.pi) < 1e-3


class TestDecodeCandidatesSpec:
    def test_wide_gather_decode_matches_naive_formulation(self):
        """The production decode selects + gathers through one wide-row
        per-cell table (anchor_head.py perf notes); this pins it to the
        naive spec: sigmoid all scores, top-k the per-anchor max, gather
        each tensor by flat anchor index (reference mmdet3d
        Anchor3DHead.get_bboxes pre-NMS semantics)."""
        from omnihd_scenes_tpu.models.anchor_head import (
            anchor_head_decode_candidates, decode_boxes)
        from omnihd_scenes_tpu.ops.boxes3d import limit_period

        rng = np.random.RandomState(7)
        H, W, AA, C = 8, 12, 8, 4
        cfg = DecodeCfg(nms_pre=20)
        cls = jnp.asarray(rng.randn(H, W, AA * C).astype(np.float32))
        box = jnp.asarray(rng.randn(H, W, AA * 9).astype(np.float32) * .1)
        dirp = jnp.asarray(rng.randn(H, W, AA * 2).astype(np.float32))
        anchors = jnp.asarray(rng.randn(H, W, AA, 9).astype(np.float32))

        got_b, got_s = anchor_head_decode_candidates(
            cls, box, dirp, anchors, cfg)

        a = H * W * AA
        scores = jax.nn.sigmoid(cls.reshape(a, C))
        _, topk = jax.lax.top_k(jnp.max(scores, axis=-1), cfg.nms_pre)
        fa = anchors.reshape(a, 9)
        boxes = decode_boxes(fa[topk], box.reshape(a, 9)[topk])
        dir_score = jnp.argmax(dirp.reshape(a, 2)[topk], axis=-1)
        dir_rot = limit_period(boxes[:, 6] - cfg.dir_offset,
                               cfg.dir_limit_offset, jnp.pi)
        yaw = (dir_rot + cfg.dir_offset
               + jnp.pi * dir_score.astype(boxes.dtype))
        want_b = boxes.at[:, 6].set(yaw)
        want_s = scores[topk]

        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-6, atol=1e-6)
