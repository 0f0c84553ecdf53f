"""Devkit geometry + quaternion unit tests."""

import numpy as np
import pytest

from omnihd_scenes_tpu.devkit.boxes import Box
from omnihd_scenes_tpu.devkit.geometry import (BoxVisibility, box_in_image,
                                               points_in_box, transform_matrix,
                                               transform_points, view_points)
from omnihd_scenes_tpu.utils.quaternion import Quaternion


class TestQuaternion:
    def test_identity(self):
        q = Quaternion()
        assert np.allclose(q.rotation_matrix, np.eye(3))

    def test_axis_angle_yaw(self):
        q = Quaternion(axis=[0, 0, 1], radians=np.pi / 2)
        v = q.rotate([1.0, 0.0, 0.0])
        assert np.allclose(v, [0, 1, 0], atol=1e-12)
        assert np.isclose(q.yaw_pitch_roll[0], np.pi / 2)

    def test_mul_vs_matrix(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            e1 = rng.randn(4)
            e2 = rng.randn(4)
            q1 = Quaternion(e1 / np.linalg.norm(e1))
            q2 = Quaternion(e2 / np.linalg.norm(e2))
            assert np.allclose((q1 * q2).rotation_matrix,
                               q1.rotation_matrix @ q2.rotation_matrix,
                               atol=1e-10)

    def test_inverse(self):
        q = Quaternion(axis=[0.3, -0.5, 0.8], radians=1.234)
        assert np.allclose((q * q.inverse).elements, [1, 0, 0, 0], atol=1e-12)

    def test_matrix_round_trip(self):
        rng = np.random.RandomState(1)
        for _ in range(20):
            e = rng.randn(4)
            q = Quaternion(e / np.linalg.norm(e))
            q2 = Quaternion(matrix=q.rotation_matrix)
            assert np.allclose(q2.rotation_matrix, q.rotation_matrix, atol=1e-8)


class TestViewPoints:
    def test_orthographic_identity(self):
        pts = np.random.RandomState(0).randn(3, 10)
        out = view_points(pts, np.eye(3), normalize=False)
        assert np.allclose(out, pts)

    def test_perspective(self):
        intrinsic = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
        pts = np.array([[0.0], [0.0], [10.0]])
        out = view_points(pts, intrinsic, normalize=True)
        assert np.allclose(out[:2, 0], [50, 50])

    def test_translation_in_3x4(self):
        view = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])])
        pts = np.zeros((3, 1))
        out = view_points(pts, view, normalize=False)
        assert np.allclose(out[:, 0], [1, 2, 3])


class TestTransformMatrix:
    def test_round_trip(self):
        t = np.array([1.0, -2.0, 0.5])
        q = Quaternion(axis=[0, 0, 1], radians=0.7)
        fwd = transform_matrix(t, q, inverse=False)
        inv = transform_matrix(t, q, inverse=True)
        assert np.allclose(fwd @ inv, np.eye(4), atol=1e-12)

    def test_transform_points(self):
        t = np.array([1.0, 2.0, 3.0])
        q = Quaternion(axis=[0, 0, 1], radians=np.pi / 2)
        tm = transform_matrix(t, q)
        pts = np.array([[1.0, 0.0, 0.0]])
        out = transform_points(pts, tm)
        assert np.allclose(out, [[1.0, 3.0, 3.0]], atol=1e-12)


class TestBox:
    def _box(self, yaw=0.0):
        return Box([1.0, 2.0, 3.0], [2.0, 4.0, 1.5],
                   Quaternion(axis=[0, 0, 1], radians=yaw))

    def test_corners_extents(self):
        box = self._box()
        corners = box.corners()
        assert corners.shape == (3, 8)
        # x extent = length, y extent = width, z extent = height.
        assert np.isclose(corners[0].max() - corners[0].min(), 4.0)
        assert np.isclose(corners[1].max() - corners[1].min(), 2.0)
        assert np.isclose(corners[2].max() - corners[2].min(), 1.5)

    def test_rotate_translate_round_trip(self):
        box = self._box(yaw=0.3)
        ref = box.corners().copy()
        q = Quaternion(axis=[0, 0, 1], radians=1.1)
        box.rotate(q)
        box.rotate(q.inverse)
        assert np.allclose(box.corners(), ref, atol=1e-10)

    def test_points_in_box(self):
        box = self._box()
        inside = np.array([[1.0], [2.0], [3.0]])
        outside = np.array([[10.0], [2.0], [3.0]])
        assert points_in_box(box, inside)[0]
        assert not points_in_box(box, outside)[0]

    def test_box_in_image(self):
        intrinsic = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        # Box 10m in front of a camera looking down +z.
        box = Box([0, 0, 10.0], [2, 2, 2], Quaternion())
        assert box_in_image(box, intrinsic, (128, 96), BoxVisibility.ANY)
        behind = Box([0, 0, -10.0], [2, 2, 2], Quaternion())
        assert not box_in_image(behind, intrinsic, (128, 96), BoxVisibility.ANY)
        assert box_in_image(behind, intrinsic, (128, 96), BoxVisibility.NONE)


class TestBottomCorners:
    def test_bottom_z(self):
        box = Box([0, 0, 1.0], [2, 4, 2], Quaternion())
        bc = box.bottom_corners()
        assert bc.shape == (3, 4)
        assert np.allclose(bc[2], 0.0)
