"""Unit tests for the TPU-native ops: voxelization, box geometry, NMS.
NumPy brute-force references validate every kernelized formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.ops import (bbox_overlaps_nearest_3d, bev_corners,
                                   decode_boxes, encode_boxes,
                                   gravity_center, multiclass_nms_rotated,
                                   nms_rotated, rotated_iou_bev,
                                   scatter_to_bev, voxelize)

PC_RANGE = [-60, -40, -3.0, 60, 40, 5.0]
VOXEL_SIZE = [0.25, 0.25, 8]


def _rand_points(n=500, seed=0, d=4):
    rng = np.random.RandomState(seed)
    pts = rng.uniform([-65, -45, -4] + [0] * (d - 3),
                      [65, 45, 6] + [1] * (d - 3), size=(n, d))
    return pts.astype(np.float32)


class TestVoxelize:
    def test_counts_match_numpy(self):
        pts = _rand_points(800)
        mask = np.ones(800, bool)
        mask[::7] = False
        out = jax.jit(lambda p, m: voxelize(p, m, PC_RANGE, VOXEL_SIZE,
                                            2048, 10))(pts, mask)

        # NumPy reference: dict of voxel id -> points.
        x0, y0 = PC_RANGE[0], PC_RANGE[1]
        valid = (mask & (pts[:, 0] >= -60) & (pts[:, 0] < 60)
                 & (pts[:, 1] >= -40) & (pts[:, 1] < 40)
                 & (pts[:, 2] >= -3) & (pts[:, 2] < 5))
        ix = np.floor((pts[valid, 0] - x0) / 0.25).astype(int)
        iy = np.floor((pts[valid, 1] - y0) / 0.25).astype(int)
        ids = iy * 480 + ix
        uniq, counts = np.unique(ids, return_counts=True)

        n_voxels = int(np.asarray(out.valid).sum())
        assert n_voxels == len(uniq)
        assert int(np.asarray(out.num_points).sum()) == int(
            np.minimum(counts, 10).sum())

    def test_point_content_preserved(self):
        pts = _rand_points(200, seed=1)
        mask = np.ones(200, bool)
        out = voxelize(pts, mask, PC_RANGE, VOXEL_SIZE, 1024, 10)
        feats = np.asarray(out.features)
        npts = np.asarray(out.num_points)
        coords = np.asarray(out.coords)
        for v in range(feats.shape[0]):
            for p in range(npts[v]):
                x, y = feats[v, p, 0], feats[v, p, 1]
                assert int((x + 60) / 0.25) == coords[v, 1]
                assert int((y + 40) / 0.25) == coords[v, 0]

    def test_max_points_cap(self):
        # All points in the same voxel.
        pts = np.tile(np.array([[0.1, 0.1, 0.0, 1.0]], np.float32), (50, 1))
        out = voxelize(pts, np.ones(50, bool), PC_RANGE, VOXEL_SIZE, 16, 10)
        assert int(np.asarray(out.valid).sum()) == 1
        assert int(np.asarray(out.num_points)[0]) == 10

    def test_scatter(self):
        feats = jnp.array([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]])
        coords = jnp.array([[5, 7], [0, 0], [2, 2]], dtype=jnp.int32)
        valid = jnp.array([True, True, False])
        canvas = scatter_to_bev(feats, coords, valid, (8, 10))
        assert canvas.shape == (8, 10, 2)
        assert np.allclose(canvas[5, 7], [1, 2])
        assert np.allclose(canvas[0, 0], [3, 4])
        assert np.allclose(canvas[2, 2], [0, 0])  # invalid dropped


def _box(x, y, w, l, yaw, z=0.0, h=2.0):
    return [x, y, z, w, l, h, yaw, 0.0, 0.0]


class TestRotatedIoU:
    def test_identical(self):
        b = jnp.array([_box(0, 0, 2, 4, 0.3)])
        iou = rotated_iou_bev(b, b)
        assert np.allclose(iou, 1.0, atol=1e-5)

    def test_identical_far_from_origin(self):
        # Regression: the slab parallel-edge threshold must scale with
        # the coordinate magnitude — an edge of a box tested against an
        # identical box carries float residue ~ulp(|corner|), which at
        # |x| ~ 60 m overshoots an absolute 1e-6 and broke the
        # 1/2-weighted boundary telescoping (IoU 0 for exact dups).
        for (x, y, yaw) in [(55.0, 38.0, 1.234), (-59.9, -39.9, -2.9)]:
            b = jnp.array([[x, y, 0.0, 2.0, 4.5, 1.5, yaw, 0, 0]],
                          jnp.float32)
            assert np.allclose(rotated_iou_bev(b, b), 1.0, atol=1e-3)

    def test_disjoint(self):
        b1 = jnp.array([_box(0, 0, 2, 2, 0.0)])
        b2 = jnp.array([_box(10, 0, 2, 2, 0.7)])
        assert np.allclose(rotated_iou_bev(b1, b2), 0.0, atol=1e-6)

    def test_axis_aligned_matches_2d(self):
        b1 = jnp.array([_box(0, 0, 2, 4, 0.0)])
        b2 = jnp.array([_box(1, 1, 2, 4, 0.0)])
        # Overlap: x in [-1,1]x[1-2? ] manual: box1 x:[-1,1] y:[-2,2];
        # box2 x:[0,2] y:[-1,3] -> inter 1*3=3, union 8+8-3=13.
        assert np.allclose(rotated_iou_bev(b1, b2), 3 / 13, atol=1e-5)

    def test_rotated_45(self):
        # Unit square vs itself rotated 45 deg: known IoU 2*(sqrt2-1)/... =
        # intersection is a regular octagon with area 4*(sqrt(2)-1).
        b1 = jnp.array([_box(0, 0, 2, 2, 0.0)])
        b2 = jnp.array([_box(0, 0, 2, 2, np.pi / 4)])
        inter = 4 * 2 * (np.sqrt(2) - 1)
        expected = inter / (4 + 4 - inter)
        assert np.allclose(rotated_iou_bev(b1, b2), expected, atol=1e-4)

    def test_containment(self):
        b1 = jnp.array([_box(0, 0, 4, 4, 0.2)])
        b2 = jnp.array([_box(0, 0, 2, 2, 0.2)])
        assert np.allclose(rotated_iou_bev(b1, b2), 4 / 16, atol=1e-5)

    @pytest.mark.slow
    def test_monte_carlo_agreement(self):
        rng = np.random.RandomState(3)
        boxes1 = np.array([_box(rng.uniform(-2, 2), rng.uniform(-2, 2),
                                rng.uniform(1, 3), rng.uniform(1, 4),
                                rng.uniform(-np.pi, np.pi))
                           for _ in range(6)])
        boxes2 = np.array([_box(rng.uniform(-2, 2), rng.uniform(-2, 2),
                                rng.uniform(1, 3), rng.uniform(1, 4),
                                rng.uniform(-np.pi, np.pi))
                           for _ in range(6)])
        iou = np.asarray(rotated_iou_bev(jnp.array(boxes1), jnp.array(boxes2)))

        # Monte-Carlo estimate.
        samples = rng.uniform(-6, 6, size=(200000, 2))

        def inside(b, pts):
            d = pts - b[:2]
            c, s = np.cos(b[6]), np.sin(b[6])
            local = np.stack([c * d[:, 0] + s * d[:, 1],
                              -s * d[:, 0] + c * d[:, 1]], 1)
            return (np.abs(local[:, 0]) <= b[3] / 2) & \
                   (np.abs(local[:, 1]) <= b[4] / 2)

        for i in range(6):
            for j in range(6):
                m1 = inside(boxes1[i], samples)
                m2 = inside(boxes2[j], samples)
                ni, nu = (m1 & m2).sum(), (m1 | m2).sum()
                mc = ni / max(nu, 1)
                assert abs(iou[i, j] - mc) < 0.03, (i, j, iou[i, j], mc)


class TestNearestIoU:
    def test_yaw_90_swaps_extents(self):
        b1 = jnp.array([_box(0, 0, 2, 4, 0.0)])
        b2 = jnp.array([_box(0, 0, 2, 4, np.pi / 2)])
        # b2's nearest bev = extents swapped -> same as 4x2 box.
        iou = bbox_overlaps_nearest_3d(b1, b2)
        # inter = 2x2=4, union = 8+8-4=12.
        assert np.allclose(iou, 1 / 3, atol=1e-5)


class TestBoxCoder:
    def test_encode_decode_round_trip(self):
        rng = np.random.RandomState(0)
        anchors = np.stack([
            rng.uniform(-50, 50, 20), rng.uniform(-30, 30, 20),
            np.full(20, -1.0), np.full(20, 2.0), np.full(20, 4.5),
            np.full(20, 1.7), rng.uniform(-np.pi, np.pi, 20),
            np.zeros(20), np.zeros(20)], axis=-1)
        gts = anchors + rng.uniform(-0.5, 0.5, anchors.shape)
        gts[:, 3:6] = np.abs(gts[:, 3:6]) + 0.5
        deltas = encode_boxes(jnp.array(anchors), jnp.array(gts))
        rec = decode_boxes(jnp.array(anchors), deltas)
        assert np.allclose(rec, gts, atol=1e-4)

    def test_gravity_center(self):
        b = jnp.array([_box(1, 2, 0.5, 2, 0, z=-1.0, h=2.0)])
        gc = gravity_center(b)
        assert np.allclose(gc, [[1, 2, 0.0]])


class TestNMS:
    def test_suppression(self):
        boxes = jnp.array([
            _box(0, 0, 2, 4, 0.0),
            _box(0.1, 0, 2, 4, 0.0),   # overlaps first heavily
            _box(20, 0, 2, 4, 0.0),    # far away
        ])
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = nms_rotated(boxes, scores, 0.2)
        assert np.array_equal(np.asarray(keep), [True, False, True])

    def test_order_independence(self):
        boxes = jnp.array([
            _box(0.1, 0, 2, 4, 0.0),
            _box(20, 0, 2, 4, 0.0),
            _box(0, 0, 2, 4, 0.0),
        ])
        scores = jnp.array([0.8, 0.7, 0.9])
        keep = nms_rotated(boxes, scores, 0.2)
        assert np.array_equal(np.asarray(keep), [False, True, True])

    def test_multiclass(self):
        boxes = jnp.array([
            _box(0, 0, 2, 4, 0.0),
            _box(0.05, 0, 2, 4, 0.0),
            _box(20, 0, 2, 4, 0.0),
        ])
        scores = jnp.array([
            [0.9, 0.1],
            [0.85, 0.8],   # suppressed in class 0, kept in class 1
            [0.02, 0.6],   # below score_thr in cls 0, kept cls 1
        ])
        out_boxes, out_scores, out_labels, out_valid = multiclass_nms_rotated(
            boxes, scores, score_thr=0.05, iou_threshold=0.2, max_num=10)
        valid = np.asarray(out_valid)
        labels = np.asarray(out_labels)[valid]
        scores_out = np.asarray(out_scores)[valid]
        # class 0: box0 keeps, box1 suppressed, box2 below score_thr;
        # class 1: box1 keeps, box0 (0.1) suppressed by box1, box2 keeps.
        assert valid.sum() == 3
        assert sorted(scores_out.tolist()) == pytest.approx([0.6, 0.8, 0.9])
        assert (labels == 0).sum() == 1 and (labels == 1).sum() == 2
