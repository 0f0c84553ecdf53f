"""Synthetic omnidirectional camera-rig geometry.

Builds realistic ``lidar2img`` matrices for an N-camera surround rig —
the same geometry the synthetic dataset generator uses
(``devkit/synthetic.py``: yaw ring at the OmniHD camera headings,
pinhole f = 0.8*W) — for benchmarks and tests that need non-degenerate
projective geometry without a dataset on disk (e.g. validating the
SpatialCrossAttention static query capacity against real per-camera
hit fractions).

Reference rig: six cameras at yaws {0, ±55, ±125, 180} deg
(``/root/reference/newscenes_devkit`` calibration layout).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# OmniHD-Scenes camera headings (degrees), front first.
OMNIHD_CAMERA_YAWS = (0.0, 55.0, -55.0, 180.0, 125.0, -125.0)

# Camera axes (x right, y down, z forward) expressed in ego axes
# (x forward, y left, z up).
_CAM_BASE = np.array([[0.0, 0.0, 1.0],
                      [-1.0, 0.0, 0.0],
                      [0.0, -1.0, 0.0]])


def _yaw_mat(yaw_rad: float) -> np.ndarray:
    c, s = np.cos(yaw_rad), np.sin(yaw_rad)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def ring_rig_lidar2img(img_hw: Tuple[int, int] = (544, 960),
                       yaws_deg: Sequence[float] = OMNIHD_CAMERA_YAWS,
                       focal_frac: float = 0.8,
                       cam_height: float = 1.6,
                       cam_radius: float = 1.5) -> np.ndarray:
    """(num_cam, 4, 4) float32 lidar2img for a surround pinhole rig.

    The lidar frame is taken as the ego frame (x forward, y left,
    z up); each camera sits at ``cam_radius`` m from the origin along
    its heading, ``cam_height`` m up, looking outward.  Intrinsics:
    f = focal_frac * W, principal point at the image center — HFOV
    = 2*atan(0.5/focal_frac) ~= 64 deg at the default.
    """
    h, w = img_hw
    k = np.array([[focal_frac * w, 0.0, w / 2.0],
                  [0.0, focal_frac * w, h / 2.0],
                  [0.0, 0.0, 1.0]])
    out = []
    for yaw in yaws_deg:
        rot = _yaw_mat(np.deg2rad(yaw)) @ _CAM_BASE       # cam->ego
        trans = _yaw_mat(np.deg2rad(yaw)) @ np.array(
            [cam_radius, 0.0, cam_height])
        cam2ego = np.eye(4)
        cam2ego[:3, :3] = rot
        cam2ego[:3, 3] = trans
        ego2cam = np.linalg.inv(cam2ego)
        proj = np.eye(4)
        proj[:3, :3] = k
        out.append(proj @ ego2cam)
    return np.asarray(out, np.float32)


def ring_rig_img2lidar(img_hw: Tuple[int, int] = (544, 960),
                       yaws_deg: Sequence[float] = OMNIHD_CAMERA_YAWS,
                       focal_frac: float = 0.8,
                       cam_height: float = 1.6,
                       cam_radius: float = 1.5):
    """(rots (N, 3, 3), trans (N, 3)) float32 in the LSS convention
    ``p_ego = rots @ (u*d, v*d, d) + trans`` (intrinsic inverse folded
    into the rotation — ``models/lss.py`` / ``ops/lss_project.py``).
    Same rig as :func:`ring_rig_lidar2img`.
    """
    h, w = img_hw
    k = np.array([[focal_frac * w, 0.0, w / 2.0],
                  [0.0, focal_frac * w, h / 2.0],
                  [0.0, 0.0, 1.0]])
    k_inv = np.linalg.inv(k)
    rots, trans = [], []
    for yaw in yaws_deg:
        rot = _yaw_mat(np.deg2rad(yaw)) @ _CAM_BASE       # cam->ego
        rots.append(rot @ k_inv)
        trans.append(_yaw_mat(np.deg2rad(yaw)) @ np.array(
            [cam_radius, 0.0, cam_height]))
    return (np.asarray(rots, np.float32), np.asarray(trans, np.float32))
