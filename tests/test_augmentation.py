"""Augmentation invariants: geometry consistency of joint transforms."""

import numpy as np
import pytest

from omnihd_scenes_tpu.data.augmentation import (global_rot_scale_trans,
                                                 photometric_distortion,
                                                 random_flip_3d)


class TestGlobalRotScaleTrans:
    def test_points_in_box_stay_in_box(self):
        """Points inside a box remain inside after the joint transform."""
        from omnihd_scenes_tpu.devkit.boxes import Box
        from omnihd_scenes_tpu.devkit.geometry import points_in_box
        from omnihd_scenes_tpu.utils.quaternion import Quaternion

        rng = np.random.RandomState(0)
        box9 = np.array([[3.0, -2.0, -0.5, 2.0, 4.0, 1.6, 0.4, 1.0, 0.5]])

        def make_box(b):
            return Box([b[0], b[1], b[2] + b[5] / 2], [b[3], b[4], b[5]],
                       Quaternion(axis=[0, 0, 1], radians=float(b[6])))

        # Sample points inside the original box by rejection.
        cand = rng.uniform([-0, -7, -2], [7, 3, 2], size=(4000, 3))
        inside0 = points_in_box(make_box(box9[0]), cand.T, wlh_factor=0.95)
        pts = cand[inside0]
        assert len(pts) > 20

        new_pts, new_boxes, ang, scale = global_rot_scale_trans(
            pts, box9, rng, trans_std=(0.5, 0.5, 0.2))
        inside = points_in_box(make_box(new_boxes[0]), new_pts[:, :3].T,
                               wlh_factor=1.05)
        assert inside.mean() > 0.95

    def test_velocity_rotated(self):
        rng = np.random.RandomState(1)
        pts = np.zeros((4, 5), np.float32)
        pts[:, 3] = 1.0   # vx
        boxes = np.zeros((1, 9), np.float32)
        boxes[0, 3:6] = 1.0
        boxes[0, 7] = 2.0  # vx
        new_pts, new_boxes, ang, scale = global_rot_scale_trans(
            pts, boxes, rng, rot_range=(0.5, 0.5), scale_range=(1.0, 1.0),
            vel_dims=(3, 5))
        c, s = np.cos(0.5), np.sin(0.5)
        assert np.allclose(new_pts[0, 3:5], [c, s], atol=1e-5)
        assert np.allclose(new_boxes[0, 7:9], [2 * c, 2 * s], atol=1e-5)


class TestFlip:
    def test_flip_consistency(self):
        rng = np.random.RandomState(0)
        pts = np.array([[1.0, 2.0, 0.0, 0.5, 0.7]], np.float32)
        boxes = np.array([[1.0, 2.0, 0.0, 2, 4, 1.5, 0.3, 1.0, 0.5]],
                         np.float32)
        new_pts, new_boxes, flipped = random_flip_3d(
            pts, boxes, rng, flip_ratio=1.0, vel_dims=(3, 5))
        assert flipped
        assert new_pts[0, 1] == -2.0
        assert new_pts[0, 4] == pytest.approx(-0.7)
        assert new_boxes[0, 1] == -2.0
        assert new_boxes[0, 6] == pytest.approx(-0.3)
        assert new_boxes[0, 8] == pytest.approx(-0.5)

    def test_no_flip(self):
        rng = np.random.RandomState(0)
        pts = np.ones((2, 4), np.float32)
        boxes = np.ones((1, 9), np.float32)
        p2, b2, flipped = random_flip_3d(pts, boxes, rng, flip_ratio=0.0)
        assert not flipped
        assert np.array_equal(p2, pts)


class TestPhotometric:
    def test_shape_and_variation(self):
        rng = np.random.RandomState(3)
        imgs = np.zeros((2, 8, 8, 3), np.float32) + 0.5
        out = photometric_distortion(imgs, rng)
        assert out.shape == imgs.shape
        # Same jitter across views.
        assert np.allclose(out[0], out[1])
