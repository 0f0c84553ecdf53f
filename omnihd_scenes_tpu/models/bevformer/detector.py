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
    # TemporalSelfAttention implementation: 'gather' (patch-gather
    # parity path) or 'windowed' (tile-local one-hot matmul dual with
    # ego-shift roll; bit-compatible while learned offsets stay within
    # the window radius — see ops/ms_deform_attn.msda_windowed_bev).
    tsa_impl: str = 'gather'


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
            sca_query_cap=self.cfg.sca_query_cap,
            tsa_impl=self.cfg.tsa_impl)

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


def sca_overflow_for_rig(cfg: BEVFormerConfig,
                         lidar2img: np.ndarray) -> int:
    """Host-side serving preflight: hit queries a given rig would DROP
    under ``cfg.sca_query_cap``.

    The static per-camera SCA rebatching (attention.py
    ``SpatialCrossAttention.query_cap``) is exactly equivalent to the
    reference's dynamic ``max_len`` rebatching
    (``spatial_cross_attention.py:136-154``) only while no camera's hit
    count exceeds the cap; beyond it, overflowing queries silently lose
    that camera's contribution.  This evaluates the projection geometry
    for one rig (``lidar2img``: (num_cam, 4, 4)) on the host and
    returns the total dropped-query count — serving entry points
    (tools/test.py) call it per distinct rig and fail loudly on a
    nonzero result instead of silently degrading.
    """
    if cfg.sca_query_cap >= 1.0:
        return 0
    from omnihd_scenes_tpu.models.bevformer.attention import (
        sca_cap_overflow)
    from omnihd_scenes_tpu.models.bevformer.encoder import (
        get_reference_points_3d, point_sampling)

    z_range = cfg.pc_range[5] - cfg.pc_range[2]
    ref_3d = jnp.asarray(get_reference_points_3d(
        cfg.bev_h, cfg.bev_w, 4, z_range))
    _, bev_mask = point_sampling(ref_3d, cfg.pc_range,
                                 jnp.asarray(lidar2img, jnp.float32),
                                 cfg.img_hw)
    return int(sca_cap_overflow(bev_mask, cfg.sca_query_cap))


def estimate_stream_batch_hbm_gb(cfg: BEVFormerConfig,
                                 batch: int) -> float:
    """Rough HBM estimate for the scene-parallel batched streaming
    forward (``run_streaming_inference_batched`` / ``bench.py
    --bevformer --batch N``).

    The deformable-attention tap tensors scale linearly with the stream
    count: under ``vmap`` the per-chunk query bound in
    ``ops/ms_deform_attn.py`` multiplies by B, and XLA keeps several
    chunk buffers plus backbone/neck activations live concurrently.
    Calibrated against v5e measurements (BENCH.md round 3): b2 fits the
    16 GB chip, b4 killed the TPU worker — i.e. ~3.4 GB/stream at the
    production scale (160x240 BEV, 256 dims, 6 cams at 544x960).  The
    estimate scales those measurements by the config's tensor volumes;
    it is a preflight guard, not a profiler.
    """
    prod_gb_per_stream = 3.4
    nq_scale = (cfg.bev_h * cfg.bev_w) / (160 * 240)
    dim_scale = cfg.embed_dims / 256
    img_scale = (cfg.img_hw[0] * cfg.img_hw[1] * cfg.num_cams
                 ) / (544 * 960 * 6)
    # Taps dominate (~2/3, scale with BEV queries x dims); backbone
    # activations are the rest (scale with image pixels).
    per_stream = prod_gb_per_stream * (
        0.67 * nq_scale * dim_scale + 0.33 * img_scale)
    return batch * per_stream


def check_stream_batch_fits(cfg: BEVFormerConfig, batch: int,
                            budget_gb: float = 13.0) -> None:
    """Raise with a clear message when the batched streaming forward is
    projected to exceed HBM (the b4 failure mode was an uncontrolled
    TPU worker crash, not a clean RESOURCE_EXHAUSTED — VERDICT r3)."""
    est = estimate_stream_batch_hbm_gb(cfg, batch)
    if est > budget_gb:
        raise ValueError(
            f'batched BEVFormer streaming with batch={batch} is '
            f'projected to need ~{est:.1f} GB HBM (> {budget_gb:.1f} GB '
            f'usable on a 16 GB chip) — the deformable-attention tap '
            f'tensors scale linearly with the stream count and this '
            f'configuration is measured to crash the TPU worker. Use a '
            f'smaller --batch (b2 fits at production scale), or run '
            f'one stream per dispatch (the default, and also the '
            f'fastest: gather rows scale with B, so scene-parallelism '
            f'adds no throughput — BENCH.md round 3).')
