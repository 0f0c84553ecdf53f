"""Multi-task OD + occupancy head and detector.

Parity targets:
- ``MultiTaskHeadv2`` (reference ``bevfusion/dense_heads/
  mtl_occ_det_headv2.py:21-183``): per-task ``BevFeatureSlicer`` grid
  crops + task decoders ('3dod' -> Anchor3DHeadV1, 'occ' ->
  BEVOCCHead2Dv2), per-task loss scaling (``scale_task_losses``);
- ``BevFeatureSlicer`` (``dense_heads/map_head.py:37-78``):
  grid_sample-based BEV re-gridding (identity when grids coincide);
- ``BEV_FasterRCNN_MTL`` (``bevfusion/detectors/bevf_faster_rcnn_MTL.py
  :31-327``): the BEVFusion trunk feeding the multi-task head; test
  returns {'bbox_results', 'occ_results'}.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.anchor_head import Anchor3DHead
from omnihd_scenes_tpu.models.bevfusion import BEVFusion, BEVFusionConfig
from omnihd_scenes_tpu.models.layers import ConvBNReLU
from omnihd_scenes_tpu.models.occ_head import BEVOCCHead2D
from omnihd_scenes_tpu.models.resnet import BasicBlock
from omnihd_scenes_tpu.ops.ms_deform_attn import bilinear_sample


def bev_feature_slice(bev: jnp.ndarray, src_grid, dst_grid) -> jnp.ndarray:
    """Resample BEV features from one grid spec to another.

    grid spec: (xbound, ybound) with bound = (min, max, step).  Identity
    when the grids match (reference BevFeatureSlicer ``map_head.py:
    37-78``).
    """
    if src_grid == dst_grid:
        return bev
    (sx0, sx1, sdx), (sy0, sy1, sdy) = src_grid
    (dx0, dx1, ddx), (dy0, dy1, ddy) = dst_grid
    h = int(round((dy1 - dy0) / ddy))
    w = int(round((dx1 - dx0) / ddx))
    xs = dx0 + (jnp.arange(w) + 0.5) * ddx
    ys = dy0 + (jnp.arange(h) + 0.5) * ddy
    px = (xs - sx0) / sdx - 0.5
    py = (ys - sy0) / sdy - 0.5
    gx, gy = jnp.meshgrid(px, py)
    loc = jnp.stack([gx, gy], -1).reshape(-1, 2)
    out = bilinear_sample(bev, loc)
    return out.reshape(h, w, bev.shape[-1])


class BevEncodeTrunk(nn.Module):
    """Small resnet-18-style BEV trunk (reference ``BevEncode``)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        ura = not train
        x = ConvBNReLU(64, (7, 7), strides=(2, 2))(x, train)
        x1 = BasicBlock(64, use_running_average=ura)(x)
        x1 = BasicBlock(64, use_running_average=ura)(x1)
        x2 = BasicBlock(128, strides=2, use_running_average=ura)(x1)
        x2 = BasicBlock(128, use_running_average=ura)(x2)
        x3 = BasicBlock(256, strides=2, use_running_average=ura)(x2)
        x3 = BasicBlock(256, use_running_average=ura)(x3)
        up = jax.image.resize(x3, x1.shape[:-1] + (x3.shape[-1],),
                              method='bilinear')
        y = jnp.concatenate([x1, up], axis=-1)
        y = ConvBNReLU(256, (3, 3))(y, train)
        y = jax.image.resize(y, x.shape[:-3] + (x.shape[-3] * 2,
                                                x.shape[-2] * 2, 256),
                             method='bilinear')
        y = ConvBNReLU(128, (3, 3))(y, train)
        return nn.Conv(self.out_channels, (1, 1))(y)


@dataclass(frozen=True)
class MTLConfig:
    fusion: BEVFusionConfig = BEVFusionConfig()
    occ_classes: int = 12
    occ_dz: int = 16
    task_weights: Tuple[float, float] = (1.0, 1.0)   # (3dod, occ)
    enable_det: bool = True
    enable_occ: bool = True
    # Task-trunk structure (reference has two head generations):
    #   'none'     -- MultiTaskHeadv2, the structure the shipped OCC
    #                 baseline uses (``bevfusion_occ.py:128``): per-task
    #                 BevFeatureSlicer crop -> task decoder directly,
    #                 NO BevEncode trunk (``mtl_occ_det_headv2.py:
    #                 165-183``; v2's __init__ builds no
    #                 taskfeat_encoders).
    #   'per_task' -- MultiTaskHead v1 default: one BevEncode trunk per
    #                 enabled task between crop and decoder
    #                 (``mtl_occ_det_head.py:74-90,199-219``).
    #   'shared'   -- v1 shared_feature=True: a single shared BevEncode
    #                 on the full BEV, then per-task crops
    #                 (``mtl_occ_det_head.py:61-73,180-197``).  v2's
    #                 shared path dereferences a ``taskfeat_encoders``
    #                 dict its __init__ never creates (it would crash);
    #                 the semantics here follow v1.
    trunk_mode: str = 'none'
    # BevFeatureSlicer grids ((x0,x1,dx),(y0,y1,dy)) per ``map_head.py:
    # 37-78``.  None (or equal grids) = identity crop — the shipped OCC
    # config sets grid_conf == det_grid_conf == occ_grid_conf
    # (``bevfusion_occ.py:9-21``), so identity is the parity default.
    grid_conf: Optional[Tuple] = None
    det_grid_conf: Optional[Tuple] = None
    occ_grid_conf: Optional[Tuple] = None

    def __post_init__(self):
        if self.trunk_mode not in ('none', 'per_task', 'shared'):
            raise ValueError(f"trunk_mode {self.trunk_mode!r} not in "
                             "('none', 'per_task', 'shared')")


class BEVFusionMTL(nn.Module):
    """Fusion trunk + multi-task (detection, occupancy) heads."""

    cfg: MTLConfig = MTLConfig()

    @nn.compact
    def __call__(self, points=None, points_mask=None, imgs=None,
                 rots=None, trans=None, train: bool = True):
        cfg = self.cfg
        fcfg = cfg.fusion
        own_det_head = cfg.enable_det and cfg.trunk_mode != 'none'
        if own_det_head:
            # v1 modes own the detection head (after the det trunk);
            # drop the fusion trunk's built-in one.
            fcfg = dataclasses.replace(fcfg, with_head=False)
        trunk = BEVFusion(fcfg, name='fusion')
        out = trunk(points, points_mask, imgs, rots, trans, train=train)
        bev = out['bev']                       # (B, Dy, Dx, C)

        def crop(x, dst_grid):
            if (cfg.grid_conf is None or dst_grid is None
                    or cfg.grid_conf == dst_grid):
                return x
            return jax.vmap(lambda b: bev_feature_slice(
                b, cfg.grid_conf, dst_grid))(x)

        results = {'depth': out['depth'], 'depth_logits': out['depth_logits'],
                   'bev': bev}
        if cfg.trunk_mode == 'shared':
            # trunk first, crops after (v1 forward_with_shared_features).
            bev = BevEncodeTrunk(256, name='shared_trunk')(bev, train)

        if cfg.enable_det:
            if cfg.trunk_mode == 'none':
                # v2: the fusion trunk's Anchor3DHead on the (identity-
                # cropped) fused BEV serves the 3dod task.
                results.update(cls_score=out['cls_score'],
                               bbox_pred=out['bbox_pred'],
                               dir_pred=out['dir_pred'])
            else:
                det_feat = crop(bev, cfg.det_grid_conf)
                if cfg.trunk_mode == 'per_task':
                    det_feat = BevEncodeTrunk(256, name='det_trunk')(
                        det_feat, train)
                head = Anchor3DHead(
                    num_classes=cfg.fusion.pillars.num_classes,
                    num_anchors=cfg.fusion.pillars.num_anchors,
                    name='det_head')
                cls_score, bbox_pred, dir_pred = head(det_feat)
                results.update(cls_score=cls_score, bbox_pred=bbox_pred,
                               dir_pred=dir_pred)
        if cfg.enable_occ:
            occ_bev = crop(bev, cfg.occ_grid_conf)
            if cfg.trunk_mode == 'per_task':
                occ_bev = BevEncodeTrunk(256, name='occ_trunk')(
                    occ_bev, train)
            occ = BEVOCCHead2D(out_dim=256, dz=cfg.occ_dz,
                               num_classes=cfg.occ_classes,
                               name='occ_head')(occ_bev)
            results['occ_logits'] = occ        # (B, Dx, Dy, Dz, n_cls)
        return results
