"""Hard voxelization with static shapes (TPU-native).

Replaces mmdet3d's ``Voxelization`` CUDA op (used via
``pts_voxel_layer`` in the reference configs, e.g.
``configs/PointPillars_NewScenes/pointpillars_4DRadar.py:26-30``) with a
sort-based, fully jittable formulation: no dynamic shapes, no host
round-trips.  Points are bucketed by linearized voxel id, sorted once,
and scattered into a ``(max_voxels, max_points, D)`` buffer with
out-of-capacity points dropped — the same semantics as the reference's
``max_num_points``/``max_voxels`` caps.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class VoxelizationOutput(NamedTuple):
    """Static-shape voxelization result.

    features: (V, P, D) per-voxel point buffers (zero padded)
    num_points: (V,) valid point count per voxel
    coords: (V, 2) int32 (iy, ix) grid coordinates (0 where invalid)
    valid: (V,) bool voxel validity
    """

    features: jnp.ndarray
    num_points: jnp.ndarray
    coords: jnp.ndarray
    valid: jnp.ndarray


def voxelize(points: jnp.ndarray,
             points_mask: jnp.ndarray,
             point_cloud_range: Sequence[float],
             voxel_size: Sequence[float],
             max_voxels: int,
             max_points: int) -> VoxelizationOutput:
    """Hard-voxelize a padded point cloud.

    Args:
        points: (N, D) padded points; dims 0:3 are xyz.
        points_mask: (N,) bool validity of each point.
        point_cloud_range: [x0, y0, z0, x1, y1, z1].
        voxel_size: [vx, vy, vz].
        max_voxels: static voxel capacity V.
        max_points: static per-voxel point capacity P.
    """
    n = points.shape[0]
    x0, y0, z0, x1, y1, z1 = point_cloud_range
    vx, vy, vz = voxel_size
    grid_w = int(round((x1 - x0) / vx))   # x bins
    grid_h = int(round((y1 - y0) / vy))   # y bins

    ix = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    in_range = ((points[:, 0] >= x0) & (points[:, 0] < x1)
                & (points[:, 1] >= y0) & (points[:, 1] < y1)
                & (points[:, 2] >= z0) & (points[:, 2] < z1))
    valid = in_range & points_mask.astype(bool)
    ix = jnp.clip(ix, 0, grid_w - 1)
    iy = jnp.clip(iy, 0, grid_h - 1)

    big = grid_w * grid_h  # sentinel id for invalid points (sorts last)
    lin = jnp.where(valid, iy * grid_w + ix, big)

    order = jnp.argsort(lin)  # invalid points go to the tail
    lin_s = lin[order]
    pts_s = points[order]
    valid_s = lin_s < big

    # Segment structure over the sorted ids.
    new_seg = jnp.concatenate([
        jnp.array([True]), lin_s[1:] != lin_s[:-1]]) & valid_s
    seg_rank = jnp.cumsum(new_seg) - 1                       # voxel index
    arange = jnp.arange(n)
    seg_start = jax.lax.cummax(jnp.where(new_seg, arange, 0))
    pos = arange - seg_start                                  # slot in voxel

    keep = valid_s & (seg_rank < max_voxels) & (pos < max_points)
    vidx = jnp.where(keep, seg_rank, max_voxels)      # OOB => dropped
    pidx = jnp.where(keep, pos, max_points)

    features = jnp.zeros((max_voxels, max_points, points.shape[1]),
                         dtype=points.dtype)
    features = features.at[vidx, pidx].set(
        jnp.where(keep[:, None], pts_s, 0.0), mode='drop')

    num_points = jnp.zeros((max_voxels,), dtype=jnp.int32).at[vidx].add(
        keep.astype(jnp.int32), mode='drop')

    iyx_s = jnp.stack([lin_s // grid_w, lin_s % grid_w], axis=-1)
    coords = jnp.zeros((max_voxels, 2), dtype=jnp.int32).at[vidx].set(
        jnp.where(keep[:, None], iyx_s, 0).astype(jnp.int32), mode='drop')

    voxel_valid = num_points > 0
    return VoxelizationOutput(features, num_points, coords, voxel_valid)


def scatter_to_bev(pillar_features: jnp.ndarray,
                   coords: jnp.ndarray,
                   valid: jnp.ndarray,
                   grid_hw: Sequence[int]) -> jnp.ndarray:
    """PointPillarsScatter: (V, C) pillar features -> (H, W, C) canvas.

    Parity with the reference's ``pts_middle_encoder`` (``output_shape
    [320, 480]`` = y-bins x x-bins).  Invalid pillars scatter out of
    bounds and are dropped.
    """
    h, w = grid_hw
    iy = jnp.where(valid, coords[:, 0], h)  # OOB => dropped
    ix = jnp.where(valid, coords[:, 1], w)
    canvas = jnp.zeros((h, w, pillar_features.shape[-1]),
                       dtype=pillar_features.dtype)
    return canvas.at[iy, ix].set(pillar_features, mode='drop')
