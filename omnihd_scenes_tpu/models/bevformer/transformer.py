"""PerceptionTransformer: ego-motion-aware BEV encoder/decoder driver.

Parity target: ``PerceptionTransformer``
(reference ``bevformer/modules/transformer.py:26-307``):
- ego-motion BEV shift from can_bus deltas, grid-normalized
  (``:127-151``);
- prev-BEV rotation by the can_bus patch angle around the grid center
  (``:152-173``, torchvision ``rotate`` -> bilinear resample here);
- can_bus MLP added to the BEV queries, per-camera + per-level embeds
  (``:175-197``);
- decoder query split (pos, feat) + linear->sigmoid 3D reference points
  (``:281-307``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.bevformer.decoder import (
    DetectionTransformerDecoder)
from omnihd_scenes_tpu.models.bevformer.encoder import BEVFormerEncoder
from omnihd_scenes_tpu.ops.ms_deform_attn import bilinear_sample


def compute_bev_shift(can_bus: jnp.ndarray, grid_length_xy: Tuple[float, float],
                      bev_hw: Tuple[int, int],
                      use_shift: bool = True) -> jnp.ndarray:
    """Normalized (shift_x, shift_y) from relative can_bus.

    can_bus[0:2] = Δxy (already relative, from the temporal dataset);
    can_bus[-2] = patch angle in degrees (reference ``transformer.py:
    127-151``).
    """
    delta_x, delta_y = can_bus[0], can_bus[1]
    ego_angle = can_bus[-2]                      # degrees
    translation_length = jnp.sqrt(delta_x ** 2 + delta_y ** 2)
    translation_angle = jnp.arctan2(delta_y, delta_x) / jnp.pi * 180.0
    bev_angle = translation_angle - ego_angle
    shift_y = translation_length * jnp.sin(bev_angle / 180.0 * jnp.pi) \
        / grid_length_xy[1] / bev_hw[0]
    shift_x = translation_length * jnp.cos(bev_angle / 180.0 * jnp.pi) \
        / grid_length_xy[0] / bev_hw[1]
    scale = 1.0 if use_shift else 0.0
    return jnp.stack([shift_x * scale, shift_y * scale])


def rotate_bev(bev: jnp.ndarray, angle_deg: jnp.ndarray,
               bev_hw: Tuple[int, int],
               center: Tuple[float, float] = None) -> jnp.ndarray:
    """Rotate a flattened (nq, C) BEV map by ``angle_deg`` around
    ``center`` (pixel coords, defaults to the grid midpoint) — the
    torchvision ``rotate`` analogue via inverse bilinear resampling."""
    h, w = bev_hw
    c = bev.shape[-1]
    grid = bev.reshape(h, w, c)
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    ang = -angle_deg * jnp.pi / 180.0     # inverse mapping
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    x0 = xs - center[0]
    y0 = ys - center[1]
    src_x = cos * x0 - sin * y0 + center[0]
    src_y = sin * x0 + cos * y0 + center[1]
    loc = jnp.stack([src_x, src_y], axis=-1).reshape(-1, 2)
    out = bilinear_sample(grid, loc)
    return out.reshape(h * w, c)


class PerceptionTransformer(nn.Module):
    """Encoder + decoder orchestration for one sample."""

    embed_dims: int = 256
    num_cams: int = 6
    num_feature_levels: int = 1
    encoder_layers: int = 3
    decoder_layers: int = 6
    bev_h: int = 160
    bev_w: int = 240
    pc_range: Sequence[float] = (-60, -40, -3.0, 60, 40, 5.0)
    num_points_in_pillar: int = 4
    use_shift: bool = True
    use_can_bus: bool = True
    use_cams_embeds: bool = True
    rotate_prev_bev: bool = True
    sca_query_cap: float = 1.0
    tsa_impl: str = 'gather'

    def setup(self):
        self.level_embeds = self.param(
            'level_embeds', nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dims))
        self.cams_embeds = self.param(
            'cams_embeds', nn.initializers.normal(1.0),
            (self.num_cams, self.embed_dims))
        self.can_bus_mlp = nn.Sequential([
            nn.Dense(self.embed_dims // 2), nn.relu,
            nn.Dense(self.embed_dims), nn.relu])
        self.encoder = BEVFormerEncoder(
            num_layers=self.encoder_layers, embed_dims=self.embed_dims,
            bev_h=self.bev_h, bev_w=self.bev_w,
            num_points_in_pillar=self.num_points_in_pillar,
            pc_range=self.pc_range, num_cams=self.num_cams,
            sca_query_cap=self.sca_query_cap, tsa_impl=self.tsa_impl)
        self.decoder = DetectionTransformerDecoder(
            num_layers=self.decoder_layers, embed_dims=self.embed_dims)
        self.reference_points_fc = nn.Dense(3)

    def _flatten_feats(self, mlvl_feats):
        """[(num_cam, H, W, C)] -> (num_cam, sum HW, C) + shapes."""
        flat, shapes = [], []
        for lvl, feat in enumerate(mlvl_feats):
            n, h, w, c = feat.shape
            f = feat.reshape(n, h * w, c)
            if self.use_cams_embeds:
                f = f + self.cams_embeds[:, None, :]
            f = f + self.level_embeds[lvl][None, None, :]
            flat.append(f)
            shapes.append((h, w))
        return jnp.concatenate(flat, axis=1), tuple(shapes)

    def get_bev_features(self, mlvl_feats, bev_queries, bev_pos, can_bus,
                         lidar2img, img_hw, prev_bev=None, has_prev=None):
        """One sample BEV encoding.  bev_queries (nq, C) learned embed."""
        grid_length = ((self.pc_range[4] - self.pc_range[1]) / self.bev_h,
                       (self.pc_range[3] - self.pc_range[0]) / self.bev_w)
        # grid_length order in the reference call is (real_h/bev_h,
        # real_w/bev_w) = (gy, gx).
        shift = compute_bev_shift(can_bus, (grid_length[1], grid_length[0]),
                                  (self.bev_h, self.bev_w), self.use_shift)

        if prev_bev is not None and self.rotate_prev_bev:
            rotation_angle = can_bus[-1]   # degrees (patch angle)
            prev_bev = rotate_bev(prev_bev, rotation_angle,
                                  (self.bev_h, self.bev_w))

        if self.use_can_bus:
            bev_queries = bev_queries + self.can_bus_mlp(can_bus)[None, :]

        cam_values, cam_shapes = self._flatten_feats(mlvl_feats)
        return self.encoder(bev_queries, bev_pos, cam_values, lidar2img,
                            img_hw, cam_shapes, prev_bev=prev_bev,
                            shift=shift, has_prev=has_prev)

    def __call__(self, mlvl_feats, bev_queries, object_query_embed, bev_pos,
                 can_bus, lidar2img, img_hw, reg_branch_fn, prev_bev=None,
                 has_prev=None):
        """Full encode + decode; returns (bev_embed, hs, refs)."""
        bev_embed = self.get_bev_features(
            mlvl_feats, bev_queries, bev_pos, can_bus, lidar2img, img_hw,
            prev_bev=prev_bev, has_prev=has_prev)

        query_pos, query = jnp.split(object_query_embed, 2, axis=-1)
        reference_points = jax.nn.sigmoid(
            self.reference_points_fc(query_pos))

        hs, refs = self.decoder(
            query, query_pos, bev_embed, reference_points,
            ((self.bev_h, self.bev_w),), reg_branch_fn)
        return bev_embed, hs, refs
