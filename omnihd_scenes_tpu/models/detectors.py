"""Single-modality point-cloud detectors (PointPillars family).

Parity target: the reference's ``MVXFasterRCNN`` pts-only path
(radar/lidar PointPillars + RadarPillarNet configs): voxelize ->
pillar encoder -> PointPillarsScatter -> SECOND -> SECONDFPN ->
Anchor3DHead.  The whole forward is one jittable function over padded
point buffers — no dynamic shapes anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.anchor_head import Anchor3DHead
from omnihd_scenes_tpu.models.anchors import aligned_anchor_grid
from omnihd_scenes_tpu.models.pillar_encoders import (DensePillarEncoder,
                                                      PillarFeatureNet)
from omnihd_scenes_tpu.models.second import SECOND, SECONDFPN
from omnihd_scenes_tpu.ops.voxelize import scatter_to_bev, voxelize


@dataclass(frozen=True)
class PointPillarsConfig:
    """Hyperparameters; defaults = the 4D-radar PointPillars baseline."""

    point_cloud_range: Tuple[float, ...] = (-60, -40, -3.0, 60, 40, 5.0)
    voxel_size: Tuple[float, ...] = (0.25, 0.25, 8.0)
    max_voxels: int = 30000
    max_points_per_voxel: int = 10
    # 'sorted' = argsort-compacted (max_voxels, max_points) buffers,
    # exact reference cap semantics (training parity path).  'dense' =
    # sort-free scatter-add/max straight onto the BEV grid
    # (DensePillarEncoder) — checkpoint-compatible, inference path.
    pillar_impl: str = 'sorted'
    bev_hw: Tuple[int, int] = (320, 480)            # y-bins, x-bins
    pfn_channels: Tuple[int, ...] = (64,)
    with_velocity_snr_center: bool = False           # True = RadarPillarNet
    second_layer_nums: Tuple[int, ...] = (3, 5, 5)
    second_strides: Tuple[int, ...] = (2, 2, 2)
    second_channels: Tuple[int, ...] = (64, 128, 256)
    fpn_strides: Tuple[int, ...] = (1, 2, 4)
    fpn_channels: Tuple[int, ...] = (128, 128, 128)
    num_classes: int = 4
    anchor_ranges: Tuple[Tuple[float, ...], ...] = (
        (-60, -40, 0.9104247242165809, 60, 40, 0.9104247242165809),
        (-60, -40, 1.1421614665993767, 60, 40, 1.1421614665993767),
        (-60, -40, 0.9059764319390522, 60, 40, 0.9059764319390522),
        (-60, -40, 1.5158325603046292, 60, 40, 1.5158325603046292),
    )
    anchor_sizes: Tuple[Tuple[float, ...], ...] = (
        (1.9768212501227105, 4.637021209998035, 1.6647611354273741),
        (0.796163784946599, 0.8183815295280997, 1.6895737765415433),
        (0.912318683145357, 1.9201067650572057, 1.620921669034068),
        (2.6724696700336494, 8.184714524976142, 3.0254503871391982),
    )
    anchor_rotations: Tuple[float, ...] = (0.0, 1.5707963)
    axis_name: Optional[str] = None

    @property
    def head_hw(self) -> Tuple[int, int]:
        s = self.second_strides[0] * self.fpn_strides[0]
        return (self.bev_hw[0] // s, self.bev_hw[1] // s)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.anchor_rotations)

    def anchors(self) -> np.ndarray:
        """(H, W, A, 9) anchor grid for the head feature map."""
        return aligned_anchor_grid(self.head_hw, list(self.anchor_ranges),
                                   list(self.anchor_sizes),
                                   self.anchor_rotations)


class PointPillars(nn.Module):
    """Pillar detector; input is a padded (B, N, D) point buffer."""

    cfg: PointPillarsConfig = PointPillarsConfig()

    @nn.compact
    def __call__(self, points: jnp.ndarray, points_mask: jnp.ndarray,
                 train: bool = True):
        cfg = self.cfg
        if cfg.pillar_impl in ('dense', 'dense_fold'):
            canvas = DensePillarEncoder(
                feat_channels=cfg.pfn_channels, voxel_size=cfg.voxel_size,
                point_cloud_range=cfg.point_cloud_range, grid_hw=cfg.bev_hw,
                with_velocity_snr_center=cfg.with_velocity_snr_center,
                axis_name=cfg.axis_name,
                fold_bn=cfg.pillar_impl == 'dense_fold',
                name='PillarFeatureNet_0')(points, points_mask, train)
        else:
            vox = jax.vmap(lambda p, m: voxelize(
                p, m, cfg.point_cloud_range, cfg.voxel_size, cfg.max_voxels,
                cfg.max_points_per_voxel))(points, points_mask)

            pfn = PillarFeatureNet(
                feat_channels=cfg.pfn_channels,
                voxel_size=cfg.voxel_size,
                point_cloud_range=cfg.point_cloud_range,
                with_velocity_snr_center=cfg.with_velocity_snr_center,
                axis_name=cfg.axis_name)
            pillar_feats = pfn(vox.features, vox.num_points, vox.coords,
                               train)
            # Zero padded pillars so the scatter stays clean.
            pillar_feats = jnp.where(vox.valid[..., None], pillar_feats, 0.0)

            canvas = jax.vmap(
                lambda f, c, v: scatter_to_bev(f, c, v, cfg.bev_hw))(
                    pillar_feats, vox.coords, vox.valid)  # (B, H, W, C)

        feats = SECOND(cfg.second_layer_nums, cfg.second_strides,
                       cfg.second_channels, axis_name=cfg.axis_name)(
                           canvas, train)
        bev = SECONDFPN(cfg.fpn_strides, cfg.fpn_channels,
                        axis_name=cfg.axis_name)(feats, train)

        head = Anchor3DHead(num_classes=cfg.num_classes,
                            num_anchors=cfg.num_anchors)
        cls_score, bbox_pred, dir_pred = head(bev)
        return {'cls_score': cls_score, 'bbox_pred': bbox_pred,
                'dir_pred': dir_pred, 'bev': bev}
