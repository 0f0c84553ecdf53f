"""BEVFormer detector: image backbone + temporal BEV head.

Parity target: ``BEVFormer``
(reference ``bevformer/detectors/bevformer.py:20-356``):
- GridMask image augmentation (``:52-54``, ``models/utils/grid_mask.py``);
- train: the frame queue's first Q-1 frames are encoded history-only
  under stop-gradient (``obtain_history_bev``, ``:183-205``), the last
  frame trains with the resulting prev_bev;
- test: streaming ``prev_frame_info`` cache with scene-change reset and
  relative can_bus deltas lives OUTSIDE the jitted forward (host state
  in the eval runner), matching ``:270-306``.

Single-sample module: batch via ``jax.vmap`` of ``Module.apply``
(backbone norms are frozen-BN, so per-sample evaluation is exact).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.bevformer.head import BEVFormerHead
from omnihd_scenes_tpu.models.fpnc import FPN
from omnihd_scenes_tpu.models.resnet import ResNet


@dataclass(frozen=True)
class BEVFormerConfig:
    bev_h: int = 160
    bev_w: int = 240
    num_query: int = 900
    num_classes: int = 4
    embed_dims: int = 256
    encoder_layers: int = 3
    decoder_layers: int = 6
    num_cams: int = 6
    queue_length: int = 3
    pc_range: Tuple[float, ...] = (-60, -40, -3.0, 60, 40, 5.0)
    resnet_depth: int = 50
    resnet_out_indices: Tuple[int, ...] = (3,)
    # DCNv2 stages (reference R101-DCN: (False, True, True, True)).
    stage_with_dcn: Tuple[bool, bool, bool, bool] = (False,) * 4
    fpn_outs: int = 1
    img_hw: Tuple[int, int] = (544, 960)
    # Static per-camera SCA query capacity (fraction of bev_h*bev_w);
    # 1.0 = masked dense.  See SpatialCrossAttention.query_cap.
    sca_query_cap: float = 1.0


def grid_mask(imgs: jnp.ndarray, rng_key, ratio: float = 0.5,
              max_d: int = None, prob: float = 0.7) -> jnp.ndarray:
    """GridMask augmentation (reference ``models/utils/grid_mask.py``):
    a random square grid of masked patches applied to all views."""
    h, w = imgs.shape[-3], imgs.shape[-2]
    if max_d is None:
        max_d = max(min(h, w) // 2, 3)
    k1, k2, k3, k4 = jax.random.split(rng_key, 4)
    d = jax.random.randint(k1, (), 2, max_d)
    off_x = jax.random.randint(k2, (), 0, max_d)
    off_y = jax.random.randint(k3, (), 0, max_d)
    keep_len = jnp.maximum((d * ratio).astype(jnp.int32), 1)
    ys = (jnp.arange(h) + off_y) % d
    xs = (jnp.arange(w) + off_x) % d
    mask = ((ys[:, None] >= keep_len) | (xs[None, :] >= keep_len))
    apply = jax.random.uniform(k4) < prob
    mask = jnp.where(apply, mask, True)
    return imgs * mask[..., None]


class BEVFormerDetector(nn.Module):
    """Single-sample temporal detector."""

    cfg: BEVFormerConfig = BEVFormerConfig()

    def setup(self):
        self.img_backbone = ResNet(depth=self.cfg.resnet_depth,
                                   out_indices=self.cfg.resnet_out_indices,
                                   frozen_bn=True,
                                   stage_with_dcn=self.cfg.stage_with_dcn)
        self.img_neck = FPN(out_channels=self.cfg.embed_dims,
                            num_outs=self.cfg.fpn_outs)
        self.pts_bbox_head = BEVFormerHead(
            bev_h=self.cfg.bev_h, bev_w=self.cfg.bev_w,
            num_query=self.cfg.num_query, num_classes=self.cfg.num_classes,
            embed_dims=self.cfg.embed_dims,
            encoder_layers=self.cfg.encoder_layers,
            decoder_layers=self.cfg.decoder_layers,
            num_cams=self.cfg.num_cams, pc_range=self.cfg.pc_range,
            sca_query_cap=self.cfg.sca_query_cap)

    def extract_img_feat(self, imgs, train: bool = True):
        """(N, H, W, 3) -> list of (N, h, w, C) pyramid levels."""
        stages = self.img_backbone(imgs, train=train)
        return list(self.img_neck(stages))

    def __call__(self, imgs_queue, can_bus_queue, lidar2img_queue,
                 has_prev_queue, train: bool = True):
        """Temporal forward over a frame queue.

        imgs_queue: (Q, N, H, W, 3); can_bus_queue: (Q, 18) with
        *relative* deltas (dataset ``union2one`` semantics);
        lidar2img_queue: (Q, N, 4, 4);
        has_prev_queue: (Q,) bool — False at scene boundaries.
        Returns the head outputs for the LAST frame.
        """
        q = imgs_queue.shape[0]
        img_hw = (imgs_queue.shape[2], imgs_queue.shape[3])

        prev_bev = jnp.zeros(
            (self.cfg.bev_h * self.cfg.bev_w, self.cfg.embed_dims))
        has_prev = jnp.asarray(False)
        # History replay without gradients (reference obtain_history_bev).
        for i in range(q - 1):
            feats = self.extract_img_feat(imgs_queue[i], train=False)
            use = has_prev & has_prev_queue[i]
            bev = self.pts_bbox_head.get_bev(
                feats, can_bus_queue[i], lidar2img_queue[i], img_hw,
                prev_bev=prev_bev, has_prev=use)
            prev_bev = jax.lax.stop_gradient(bev)
            has_prev = jnp.asarray(True)

        feats = self.extract_img_feat(imgs_queue[-1], train=train)
        use = has_prev & has_prev_queue[-1] if q > 1 else jnp.asarray(False)
        return self.pts_bbox_head(
            feats, can_bus_queue[-1], lidar2img_queue[-1], img_hw,
            prev_bev=prev_bev, has_prev=use)

    def forward_stream(self, imgs, can_bus, lidar2img, prev_bev, has_prev,
                       train: bool = False):
        """Single-frame streaming forward (test-time recurrence).

        The host runner keeps (prev_bev, prev_pos, prev_angle) and
        computes relative can_bus before calling (reference
        ``bevformer.py:270-306``)."""
        img_hw = (imgs.shape[1], imgs.shape[2])
        feats = self.extract_img_feat(imgs, train=train)
        return self.pts_bbox_head(feats, can_bus, lidar2img, img_hw,
                                  prev_bev=prev_bev, has_prev=has_prev)
