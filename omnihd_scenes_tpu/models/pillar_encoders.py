"""Pillar / voxel feature encoders.

Parity targets:
- ``PillarFeatureNetV1`` + ``PFNLayer``
  (reference ``rcfusion/voxel_encoders/pillar_encoder.py:301-434``,
  ``voxel_encoders/utils.py``): raw features + cluster-center offset (3)
  + pillar-center xy offset (2) -> Linear(no bias) -> BN over channels
  -> ReLU -> max over points.
- ``RadarPillarFeatureNet`` (``pillar_encoder.py:11-155``): adds
  velocity/SNR mean-offset stats over dims 3:7.
- ``HardVFE``-style lidar encoder (mmdet3d) for the LiDAR PointPillars
  baseline — same pillar augmentation applied to 4-dim lidar points.

All encoders run on static (V, P, D) voxel buffers from
:func:`omnihd_scenes_tpu.ops.voxelize` — padding is masked out before
the max-pool, identical to the reference's ``get_paddings_indicator``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from omnihd_scenes_tpu.models.layers import BN_EPS, BN_MOMENTUM


class PFNLayer(nn.Module):
    """Linear (no bias) -> BN(channel) -> ReLU -> optional max-pool."""

    features: int
    last_layer: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, num_points, train: bool = True):
        # x: (..., V, P, C); num_points: (..., V)
        x = nn.Dense(self.features, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name)(x)
        x = nn.relu(x)
        mask = (jnp.arange(x.shape[-2]) < num_points[..., None])[..., None]
        x = jnp.where(mask, x, -jnp.inf)
        pooled = jnp.max(x, axis=-2)
        pooled = jnp.where(num_points[..., None] > 0, pooled, 0.0)
        if self.last_layer:
            return pooled
        # Non-final layers concat the pooled feature back onto points.
        x = jnp.where(mask, x, 0.0)
        return jnp.concatenate(
            [x, jnp.broadcast_to(pooled[..., None, :], x.shape)], axis=-1)


def _augment_pillar_features(features: jnp.ndarray,
                             num_points: jnp.ndarray,
                             coords: jnp.ndarray,
                             voxel_size: Sequence[float],
                             point_cloud_range: Sequence[float],
                             with_cluster_center: bool = True,
                             with_voxel_center: bool = True,
                             with_velocity_snr_center: bool = False):
    """Append cluster/center (and radar velocity/SNR) offset features.

    Shapes are batch-agnostic: features (..., V, P, D), num_points
    (..., V), coords (..., V, 2).
    """
    feats = [features]
    denom = jnp.clip(num_points, 1, None).astype(
        features.dtype)[..., None, None]

    if with_cluster_center:
        mean_xyz = jnp.sum(features[..., :3], axis=-2, keepdims=True) / denom
        feats.append(features[..., :3] - mean_xyz)

    if with_voxel_center:
        vx, vy = voxel_size[0], voxel_size[1]
        x_off = vx / 2 + point_cloud_range[0]
        y_off = vy / 2 + point_cloud_range[1]
        # coords = (iy, ix)
        cx = coords[..., 1].astype(features.dtype)[..., None] * vx + x_off
        cy = coords[..., 0].astype(features.dtype)[..., None] * vy + y_off
        feats.append(jnp.stack([features[..., 0] - cx,
                                features[..., 1] - cy], axis=-1))

    if with_velocity_snr_center:
        # Radar dims 3:7 = vx_comp, vy_comp, power, snr: offset from the
        # pillar mean (reference RadarPillarFeatureNet:137-142).
        mean_v = jnp.sum(features[..., 3:7], axis=-2, keepdims=True) / denom
        feats.append(features[..., 3:7] - mean_v)

    out = jnp.concatenate(feats, axis=-1)
    mask = (jnp.arange(out.shape[-2]) < num_points[..., None])[..., None]
    return jnp.where(mask, out, 0.0)


class PillarFeatureNet(nn.Module):
    """Pillar encoder covering the V1 / radar variants via flags.

    ``feat_channels=(64,)`` with in=8 radar dims -> 13 augmented dims
    -> 64 pillar features (radar PointPillars config) or
    ``with_velocity_snr_center=True`` for RadarPillarNet (17 dims).
    """

    feat_channels: Tuple[int, ...] = (64,)
    voxel_size: Sequence[float] = (0.25, 0.25, 8.0)
    point_cloud_range: Sequence[float] = (-60, -40, -3.0, 60, 40, 5.0)
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_velocity_snr_center: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, features, num_points, coords, train: bool = True):
        x = _augment_pillar_features(
            features, num_points, coords, self.voxel_size,
            self.point_cloud_range, self.with_cluster_center,
            self.with_voxel_center, self.with_velocity_snr_center)
        n = len(self.feat_channels)
        for i, ch in enumerate(self.feat_channels):
            x = PFNLayer(ch, last_layer=(i == n - 1),
                         axis_name=self.axis_name)(x, num_points, train)
        return x  # (V, C)
