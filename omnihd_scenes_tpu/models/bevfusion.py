"""BEVFusion detector: camera LSS stream + radar pillar stream.

Parity target: ``BEVF_FasterRCNN`` / ``BEVFUSION_depth``
(reference ``bevfusion/detectors/bevf_faster_rcnn.py:16-236``,
``bevf_faster_rcnn_bevdepth.py``) as configured by
``configs/bevfusion_NewScenes/bevfusion.py``:

- radar: voxelize -> PillarFeatureNetV1 -> scatter [320, 480] ->
  SECOND -> SECONDFPN -> (160, 240, 384);
- camera: ResNet50(frozen BN) -> FPNC -> LSS (D=59 depth bins,
  0.5 m grid) -> (160, 240, 256);
- fusion: concat -> 3x3 reduc_conv -> 384 -> SE gate
  (``bevf_faster_rcnn.py:136-141``);
- Anchor3DHead on the fused map; KLD depth-distribution loss vs the
  Gaussian GT depth (``:219-235``).

Camera-only mode (``lc_fusion=False``) reproduces the LSS baseline
(head directly on the 256-ch camera BEV).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.anchor_head import Anchor3DHead
from omnihd_scenes_tpu.models.detectors import PointPillarsConfig
from omnihd_scenes_tpu.models.fpnc import FPNC
from omnihd_scenes_tpu.models.layers import ConvBNReLU, SEBlock
from omnihd_scenes_tpu.models.lss import LiftSplatShoot, LSSConfig
from omnihd_scenes_tpu.models.pillar_encoders import (DensePillarEncoder,
                                                      PillarFeatureNet)
from omnihd_scenes_tpu.models.resnet import ResNet
from omnihd_scenes_tpu.models.second import SECOND, SECONDFPN
from omnihd_scenes_tpu.ops.voxelize import scatter_to_bev, voxelize


class CrossModalFusion(nn.Module):
    """RCFusion's spatial-attention swap fuser (reference
    ``rcfusion/detectors/BEVCross_modal_attention.py:6-43``): each
    modality is gated by the other's avg+max-pool spatial attention map,
    then concat + 3x3 reduce conv."""

    out_channels: int = 384
    kernel_size: int = 3

    @nn.compact
    def __call__(self, img_bev, radar_bev, train: bool = True):
        def spatial_att(x, name):
            avg = jnp.mean(x, axis=-1, keepdims=True)
            mx = jnp.max(x, axis=-1, keepdims=True)
            att = nn.Conv(1, (self.kernel_size,) * 2, padding='SAME',
                          use_bias=False, name=name)(
                              jnp.concatenate([avg, mx], axis=-1))
            return nn.sigmoid(att)

        img_att = spatial_att(img_bev, 'att_img')
        radar_att = spatial_att(radar_bev, 'att_radar')
        fused = jnp.concatenate(
            [img_bev * radar_att, radar_bev * img_att], axis=-1)
        return ConvBNReLU(self.out_channels, (3, 3))(fused, train)


@dataclass(frozen=True)
class BEVFusionConfig:
    camera_stream: bool = True
    radar_stream: bool = True
    lc_fusion: bool = True
    se: bool = True
    rc_fusion: str = 'concat'          # 'concat' | 'cross_attention'
    use_depthnet: bool = True          # BEVFUSION_depth variant
    # Rematerialize (jax.checkpoint) the heavy trunks so training fits
    # larger per-chip batches: the b=4 train step needs 22.7 GB of
    # activations un-rematted vs 15.75 GB v5e HBM (bench.py --train).
    # Trades ~1/3 extra forward FLOPs in the backward pass for dropping
    # the trunk activations.  Param trees are unchanged — the wrapped
    # trunks pin their pre-remat auto-names (nn.remat would otherwise
    # rename the scope) — so checkpoints are interchangeable either way.
    remat: bool = False
    # Trunks to EXCLUDE from remat when remat=True ('second',
    # 'secondfpn', 'resnet', 'fpnc', 'lss'): an excluded trunk keeps
    # its activations (more HBM) and skips the backward-pass recompute
    # (less time).  Use with LSSConfig.remat_parts for sub-LSS
    # granularity.  Measured trade-offs in BENCH.md "Selective remat".
    remat_exclude: Tuple[str, ...] = ()
    num_views: int = 6
    imc: int = 256                     # camera BEV channels
    lic: int = 384                     # radar BEV channels
    resnet_depth: int = 50
    resnet_out_indices: Tuple[int, ...] = (1, 2, 3)
    frozen_backbone_bn: bool = True
    # Serving input contract: imgs arrive space_to_depth-packed
    # (B, N, H/2, W/2, 12) from the host pipeline and the backbone runs
    # the exact folded stem (models/resnet.py:_S2DStem).  Param trees
    # and checkpoints are unchanged either way.
    stem_s2d: bool = False
    # Run the built-in Anchor3DHead on the fused BEV.  BEVFusionMTL
    # sets this False when its task-trunk modes own the detection head
    # (reference MultiTaskHead v1, ``mtl_occ_det_head.py:74-90``).
    with_head: bool = True
    lss: LSSConfig = LSSConfig()
    pillars: PointPillarsConfig = PointPillarsConfig()

    _TRUNKS = ('second', 'secondfpn', 'resnet', 'fpnc', 'lss')

    def __post_init__(self):
        # remat is numerically invisible: an unknown name would silently
        # no-op and the wrong configuration could be benchmarked.
        bad = set(self.remat_exclude) - set(self._TRUNKS)
        if bad:
            raise ValueError(
                f'remat_exclude {sorted(bad)} not in {self._TRUNKS}')

    @property
    def head_channels(self) -> int:
        if self.radar_stream:
            return self.lic
        return self.imc


class BEVFusion(nn.Module):
    """Fusion detector; one jittable forward over padded inputs.

    Inputs:
        points (B, P, 8) + points_mask (radar stream),
        imgs (B, N, H, W, 3),
        rots/trans (B, N, 3, 3)/(B, N, 3) img->lidar (camera stream).
    """

    cfg: BEVFusionConfig = BEVFusionConfig()

    @nn.compact
    def __call__(self, points=None, points_mask=None, imgs=None,
                 rots=None, trans=None, train: bool = True):
        cfg = self.cfg
        pts_bev = None
        depth = depth_logits = None

        def trunk(name, cls, train_argnum):
            # `train` is a Python bool -> must be static under remat.
            wrap = cfg.remat and name not in cfg.remat_exclude
            return (nn.remat(cls, static_argnums=(train_argnum,))
                    if wrap else cls)

        if cfg.radar_stream and points is not None:
            pc = cfg.pillars
            if pc.pillar_impl in ('dense', 'dense_fold'):
                # Sort-free scatter path; same param tree as the
                # PillarFeatureNet branch (name pinned), see
                # models/pillar_encoders.py:DensePillarEncoder.
                canvas = DensePillarEncoder(
                    feat_channels=pc.pfn_channels, voxel_size=pc.voxel_size,
                    point_cloud_range=pc.point_cloud_range,
                    grid_hw=pc.bev_hw,
                    with_velocity_snr_center=pc.with_velocity_snr_center,
                    fold_bn=pc.pillar_impl == 'dense_fold',
                    name='PillarFeatureNet_0')(points, points_mask, train)
            else:
                vox = jax.vmap(lambda p, m: voxelize(
                    p, m, pc.point_cloud_range, pc.voxel_size, pc.max_voxels,
                    pc.max_points_per_voxel))(points, points_mask)
                pfn = PillarFeatureNet(
                    feat_channels=pc.pfn_channels, voxel_size=pc.voxel_size,
                    point_cloud_range=pc.point_cloud_range,
                    with_velocity_snr_center=pc.with_velocity_snr_center)
                pf = pfn(vox.features, vox.num_points, vox.coords, train)
                pf = jnp.where(vox.valid[..., None], pf, 0.0)
                canvas = jax.vmap(lambda f, c, v: scatter_to_bev(
                    f, c, v, pc.bev_hw))(pf, vox.coords, vox.valid)
            feats = trunk('second', SECOND, 2)(
                pc.second_layer_nums, pc.second_strides,
                pc.second_channels, name='SECOND_0')(canvas, train)
            pts_bev = trunk('secondfpn', SECONDFPN, 2)(
                pc.fpn_strides, pc.fpn_channels,
                name='SECONDFPN_0')(feats, train)

        cam_bev = None
        if cfg.camera_stream and imgs is not None:
            b, n = imgs.shape[:2]
            flat = imgs.reshape((b * n,) + imgs.shape[2:])
            stages = trunk('resnet', ResNet, 2)(
                depth=cfg.resnet_depth,
                out_indices=cfg.resnet_out_indices,
                frozen_bn=cfg.frozen_backbone_bn,
                stem_s2d=cfg.stem_s2d,
                name='ResNet_0')(flat, train)
            feat = trunk('fpnc', FPNC, 2)(out_channels=256, outC=cfg.imc,
                                  target_hw=cfg.lss.feat_hw,
                                  name='FPNC_0')(stages, train)
            fh, fw = feat.shape[1:3]
            feat = feat.reshape(b, n, fh, fw, -1)
            cam_bev, depth, depth_logits = trunk('lss', LiftSplatShoot, 4)(
                cfg.lss, use_depthnet=cfg.use_depthnet,
                name='LiftSplatShoot_0')(
                    feat, rots, trans, train)
            # LSS grid is (ny, nx) which matches the pillar FPN output
            # orientation (y-major); resize if resolutions differ.
            if pts_bev is not None and cam_bev.shape[1:3] != pts_bev.shape[1:3]:
                cam_bev = jax.image.resize(
                    cam_bev, cam_bev.shape[:1] + pts_bev.shape[1:3]
                    + cam_bev.shape[-1:], method='bilinear')

        if pts_bev is not None and cam_bev is not None and cfg.lc_fusion:
            if cfg.rc_fusion == 'cross_attention':
                fused = CrossModalFusion(cfg.lic)(cam_bev, pts_bev, train)
            else:
                fused = jnp.concatenate([cam_bev, pts_bev], axis=-1)
                fused = ConvBNReLU(cfg.lic, (3, 3))(fused, train)
            if cfg.se:
                fused = SEBlock(cfg.lic)(fused)
        elif pts_bev is not None:
            fused = pts_bev
        else:
            fused = cam_bev

        cls_score = bbox_pred = dir_pred = None
        if cfg.with_head:
            head = Anchor3DHead(num_classes=cfg.pillars.num_classes,
                                num_anchors=cfg.pillars.num_anchors)
            cls_score, bbox_pred, dir_pred = head(fused)
        return {'cls_score': cls_score, 'bbox_pred': bbox_pred,
                'dir_pred': dir_pred, 'bev': fused,
                'depth': depth, 'depth_logits': depth_logits}


def depth_dist_loss(pred_depth: jnp.ndarray,
                    gt_gaussian: jnp.ndarray,
                    gt_min_depth: jnp.ndarray,
                    camera_depth_range: Tuple[float, float, float],
                    method: str = 'kld') -> jnp.ndarray:
    """Depth distribution loss (reference ``depth_dist_loss``).

    pred_depth: (..., D) softmax depth distributions;
    gt_gaussian: (..., D) target distributions;
    gt_min_depth: (...,) per-pixel min depth (0 = no observation).
    """
    mask = ((gt_min_depth >= camera_depth_range[0])
            & (gt_min_depth <= camera_depth_range[1]))
    denom = jnp.clip(jnp.sum(mask), 1, None)
    if method == 'kld':
        # F.kl_div(log(pred + 1e-4), target, 'batchmean').
        per = jnp.sum(
            gt_gaussian * (jnp.log(jnp.clip(gt_gaussian, 1e-12, None))
                           - jnp.log(pred_depth + 1e-4)), axis=-1)
        return jnp.sum(jnp.where(mask, per, 0.0)) / denom
    if method == 'mse':
        per = jnp.mean((pred_depth - gt_gaussian) ** 2, axis=-1)
        return jnp.sum(jnp.where(mask, per, 0.0)) / denom
    raise NotImplementedError(method)
