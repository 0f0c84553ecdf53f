"""Training augmentations (host-side NumPy).

Parity targets (reference ``datasets/pipelines/``):
- ``PhotoMetricDistortionMultiViewImage`` (``transform_3d.py``):
  random brightness/contrast/saturation/hue jitter applied identically
  across the six views (BEVFormer train pipeline);
- ``GlobalRotScaleTrans`` (mmdet3d, used by lidar pipelines): rotate /
  scale / translate points + boxes together, velocity-aware;
- ``RandomFlip3D``: horizontal BEV flip of points + boxes (+ the radar
  velocity dims, reference ``core/points/radar_points.py``);
- ``CropResizeFlipImage`` / ``RandomScaleImageMultiViewImage`` image
  scale handling lives in :mod:`omnihd_scenes_tpu.data.image_loading`
  (scales folded into lidar2img).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def photometric_distortion(imgs: np.ndarray,
                           rng: np.random.RandomState,
                           brightness_delta: float = 32.0,
                           contrast_range: Tuple[float, float] = (0.5, 1.5),
                           saturation_range: Tuple[float, float] = (0.5, 1.5),
                           hue_delta: float = 18.0) -> np.ndarray:
    """Jitter normalized multi-view images (N, H, W, 3), same params for
    every view (the reference draws once per sample)."""
    out = imgs.astype(np.float32).copy()
    if rng.randint(2):
        out += rng.uniform(-brightness_delta, brightness_delta) / 58.0
    mode = rng.randint(2)
    if mode == 1 and rng.randint(2):
        out *= rng.uniform(*contrast_range)
    # Saturation: scale chroma around the per-pixel mean.
    if rng.randint(2):
        mean = out.mean(axis=-1, keepdims=True)
        out = mean + (out - mean) * rng.uniform(*saturation_range)
    # Hue: cheap channel rotation by a small mix.
    if rng.randint(2):
        alpha = np.deg2rad(rng.uniform(-hue_delta, hue_delta))
        c, s = np.cos(alpha), np.sin(alpha)
        r, g, b = out[..., 0].copy(), out[..., 1].copy(), out[..., 2].copy()
        out[..., 0] = c * r - s * g
        out[..., 1] = s * r + c * g
        out[..., 2] = b
    if mode == 0 and rng.randint(2):
        out *= rng.uniform(*contrast_range)
    return out


def global_rot_scale_trans(points: np.ndarray,
                           gt_boxes: np.ndarray,
                           rng: np.random.RandomState,
                           rot_range: Tuple[float, float] = (-0.3925, 0.3925),
                           scale_range: Tuple[float, float] = (0.95, 1.05),
                           trans_std: Sequence[float] = (0.0, 0.0, 0.0),
                           vel_dims: Optional[Tuple[int, int]] = None):
    """Joint rotation/scale/translation of points + 9-dim boxes.

    points: (N, D) with xyz in dims 0:3 (+ optional velocity dims);
    gt_boxes: (G, 9) [x, y, z, w, l, h, yaw, vx, vy].
    Returns (points, gt_boxes, rot_angle, scale).
    """
    angle = rng.uniform(*rot_range)
    scale = rng.uniform(*scale_range)
    trans = rng.normal(scale=trans_std, size=3)

    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]], np.float32)

    pts = points.copy()
    pts[:, :2] = pts[:, :2] @ rot.T
    pts[:, :3] = pts[:, :3] * scale + trans
    if vel_dims is not None:
        a, b = vel_dims
        pts[:, a:b] = pts[:, a:b] @ rot.T * scale

    boxes = gt_boxes.copy()
    boxes[:, :2] = boxes[:, :2] @ rot.T
    boxes[:, :3] = boxes[:, :3] * scale + trans
    boxes[:, 3:6] *= scale
    boxes[:, 6] += angle
    boxes[:, 7:9] = boxes[:, 7:9] @ rot.T * scale
    return pts, boxes, angle, scale


def random_flip_3d(points: np.ndarray, gt_boxes: np.ndarray,
                   rng: np.random.RandomState,
                   flip_ratio: float = 0.5,
                   vel_dims: Optional[Tuple[int, int]] = None):
    """Horizontal (y-axis) BEV flip of points + boxes (+ velocities)."""
    flipped = bool(rng.uniform() < flip_ratio)
    if not flipped:
        return points, gt_boxes, False
    pts = points.copy()
    pts[:, 1] = -pts[:, 1]
    if vel_dims is not None:
        pts[:, vel_dims[0] + 1] = -pts[:, vel_dims[0] + 1]
    boxes = gt_boxes.copy()
    boxes[:, 1] = -boxes[:, 1]
    boxes[:, 6] = -boxes[:, 6]
    boxes[:, 8] = -boxes[:, 8]
    return pts, boxes, True
