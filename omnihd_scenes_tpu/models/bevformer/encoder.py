"""BEVFormer encoder: reference points, camera projection, layers.

Parity target: ``BEVFormerEncoder`` + ``BEVFormerLayer``
(reference ``bevformer/modules/encoder.py:24-592``):
- 3D pillar reference points (num_points_in_pillar z-anchors at pillar
  centers, normalized) and 2D BEV reference points (``:47-89``);
- ``point_sampling``: refs through per-cam ``lidar2img`` -> normalized
  UV + validity mask, fp32-forced in the reference (``:89-151``) — here
  everything already runs in fp32;
- per-layer op order self_attn(TSA) -> norm -> cross_attn(SCA) -> norm
  -> ffn -> norm (``:282-284``);
- the TSA queue stacks [shifted-prev refs, current refs] (``:203-211``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.bevformer.attention import (
    SpatialCrossAttention, TemporalSelfAttention)


def get_reference_points_3d(bev_h: int, bev_w: int, num_z: int,
                            z_range: float) -> np.ndarray:
    """(num_z, bev_h*bev_w, 3) normalized pillar reference points."""
    zs = (np.linspace(0.5, z_range - 0.5, num_z) / z_range)
    xs = (np.linspace(0.5, bev_w - 0.5, bev_w) / bev_w)
    ys = (np.linspace(0.5, bev_h - 0.5, bev_h) / bev_h)
    ref = np.zeros((num_z, bev_h, bev_w, 3), np.float32)
    ref[..., 0] = xs[None, None, :]
    ref[..., 1] = ys[None, :, None]
    ref[..., 2] = zs[:, None, None]
    return ref.reshape(num_z, bev_h * bev_w, 3)


def get_reference_points_2d(bev_h: int, bev_w: int) -> np.ndarray:
    """(bev_h*bev_w, 1, 2) normalized BEV plane reference points."""
    ys, xs = np.meshgrid(np.linspace(0.5, bev_h - 0.5, bev_h) / bev_h,
                         np.linspace(0.5, bev_w - 0.5, bev_w) / bev_w,
                         indexing='ij')
    return np.stack([xs.reshape(-1), ys.reshape(-1)],
                    -1).astype(np.float32)[:, None, :]


def point_sampling(ref_3d: jnp.ndarray, pc_range: Sequence[float],
                   lidar2img: jnp.ndarray, img_hw: Tuple[int, int]):
    """Project pillar refs into every camera.

    Args:
        ref_3d: (num_z, nq, 3) normalized references.
        lidar2img: (num_cam, 4, 4).
        img_hw: input image (H, W) for UV normalization.

    Returns:
        reference_points_cam: (num_cam, nq, num_z, 2) normalized UV;
        bev_mask: (num_cam, nq, num_z) validity.
    """
    ref = jnp.stack([
        ref_3d[..., 0] * (pc_range[3] - pc_range[0]) + pc_range[0],
        ref_3d[..., 1] * (pc_range[4] - pc_range[1]) + pc_range[1],
        ref_3d[..., 2] * (pc_range[5] - pc_range[2]) + pc_range[2],
        jnp.ones_like(ref_3d[..., 0]),
    ], axis=-1)                                            # (z, nq, 4)

    cam = jnp.einsum('nij,zqj->nzqi', lidar2img, ref)       # (cam, z, nq, 4)
    eps = 1e-5
    mask = cam[..., 2] > eps
    uv = cam[..., :2] / jnp.maximum(cam[..., 2:3], eps)
    u = uv[..., 0] / img_hw[1]
    v = uv[..., 1] / img_hw[0]
    mask = mask & (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
    uv_n = jnp.stack([u, v], axis=-1)
    # -> (cam, nq, z, ...)
    return (jnp.moveaxis(uv_n, 1, 2),
            jnp.moveaxis(mask, 1, 2))


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 512

    @nn.compact
    def __call__(self, x):
        identity = x
        x = nn.Dense(self.feedforward_channels)(x)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dims)(x)
        return x + identity


class BEVFormerLayer(nn.Module):
    """TSA -> LN -> SCA -> LN -> FFN -> LN."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    tsa_points: int = 4
    sca_points: int = 8
    num_cams: int = 6
    sca_query_cap: float = 1.0
    tsa_impl: str = 'gather'

    @nn.compact
    def __call__(self, bev_query, bev_pos, value_queue, ref_2d_queue,
                 cam_values, reference_points_cam, bev_mask,
                 bev_spatial_shapes, cam_spatial_shapes):
        x = TemporalSelfAttention(
            self.embed_dims, self.num_heads, 1, self.tsa_points,
            impl=self.tsa_impl,
            name='tsa')(bev_query, value_queue, ref_2d_queue,
                        bev_spatial_shapes, query_pos=bev_pos)
        x = nn.LayerNorm()(x)
        x = SpatialCrossAttention(
            self.embed_dims, self.num_cams, self.num_heads, 1,
            self.sca_points, query_cap=self.sca_query_cap, name='sca')(
                x, cam_values, reference_points_cam, bev_mask,
                cam_spatial_shapes)
        x = nn.LayerNorm()(x)
        x = FFN(self.embed_dims, self.feedforward_channels)(x)
        x = nn.LayerNorm()(x)
        return x


class MMBEVFormerLayer(nn.Module):
    """Multi-modal BEVFormer layer (reference ``MM_BEVFormerLayer``,
    ``encoder.py:415-592``): after spatial cross-attention the camera
    BEV is fused with a lidar/radar BEV feature through learnable
    sigmoid-gated weights."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    tsa_points: int = 4
    sca_points: int = 8
    num_cams: int = 6
    sca_query_cap: float = 1.0
    tsa_impl: str = 'gather'

    @nn.compact
    def __call__(self, bev_query, bev_pos, value_queue, ref_2d_queue,
                 cam_values, reference_points_cam, bev_mask,
                 bev_spatial_shapes, cam_spatial_shapes, lidar_bev):
        x = TemporalSelfAttention(
            self.embed_dims, self.num_heads, 1, self.tsa_points,
            impl=self.tsa_impl,
            name='tsa')(bev_query, value_queue, ref_2d_queue,
                        bev_spatial_shapes, query_pos=bev_pos)
        x = nn.LayerNorm()(x)
        x = SpatialCrossAttention(
            self.embed_dims, self.num_cams, self.num_heads, 1,
            self.sca_points, query_cap=self.sca_query_cap, name='sca')(
                x, cam_values, reference_points_cam, bev_mask,
                cam_spatial_shapes)
        # Learnable per-modality fusion gates.
        w_cam = nn.sigmoid(self.param('fusion_w_cam',
                                      nn.initializers.zeros, (1,)))
        w_pts = nn.sigmoid(self.param('fusion_w_pts',
                                      nn.initializers.zeros, (1,)))
        lidar_proj = nn.Dense(self.embed_dims, name='lidar_proj')(lidar_bev)
        x = x * w_cam + lidar_proj * w_pts
        x = nn.LayerNorm()(x)
        x = FFN(self.embed_dims, self.feedforward_channels)(x)
        x = nn.LayerNorm()(x)
        return x


class BEVFormerEncoder(nn.Module):
    """Stack of BEVFormerLayers producing the BEV embedding."""

    num_layers: int = 3
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    bev_h: int = 160
    bev_w: int = 240
    num_points_in_pillar: int = 4
    pc_range: Sequence[float] = (-60, -40, -3.0, 60, 40, 5.0)
    num_cams: int = 6
    sca_query_cap: float = 1.0
    tsa_impl: str = 'gather'

    @nn.compact
    def __call__(self, bev_query, bev_pos, cam_values, lidar2img, img_hw,
                 cam_spatial_shapes, prev_bev=None, shift=None,
                 has_prev=None):
        """bev_query/bev_pos: (nq, C); cam_values: (num_cam, len, C);
        lidar2img (num_cam, 4, 4); prev_bev (nq, C) or None;
        shift (2,) normalized BEV shift; has_prev: optional traced bool —
        when False the temporal queue degrades to [current, current]
        with unshifted references (reference scene-boundary behavior,
        ``encoder.py:203-211``)."""
        nq = self.bev_h * self.bev_w
        z_range = self.pc_range[5] - self.pc_range[2]
        ref_3d = jnp.asarray(get_reference_points_3d(
            self.bev_h, self.bev_w, self.num_points_in_pillar, z_range))
        ref_2d = jnp.asarray(get_reference_points_2d(self.bev_h, self.bev_w))

        reference_points_cam, bev_mask = point_sampling(
            ref_3d, self.pc_range, lidar2img, img_hw)

        if shift is None:
            shift = jnp.zeros((2,))
        shift_ref_2d = ref_2d + shift[None, None, :]

        if prev_bev is None:
            use_prev = jnp.asarray(False)
            prev_bev = jnp.zeros_like(bev_query)
        else:
            use_prev = (jnp.asarray(True) if has_prev is None
                        else jnp.asarray(has_prev))
        ref_prev = jnp.where(use_prev, shift_ref_2d, ref_2d)
        ref_queue = jnp.stack([ref_prev, ref_2d])        # (queue, nq, 1, 2)

        bev_spatial_shapes = ((self.bev_h, self.bev_w),)

        output = bev_query
        for i in range(self.num_layers):
            prev_val = jnp.where(use_prev, prev_bev, output)
            value_queue = jnp.stack([prev_val, output])
            output = BEVFormerLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                num_cams=self.num_cams, sca_query_cap=self.sca_query_cap,
                tsa_impl=self.tsa_impl,
                name=f'layer_{i}')(
                    output, bev_pos, value_queue, ref_queue, cam_values,
                    reference_points_cam, bev_mask, bev_spatial_shapes,
                    cam_spatial_shapes)
        return output
