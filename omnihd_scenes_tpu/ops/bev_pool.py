"""BEV pooling (LSS splat) — TPU-native segment-sum formulation.

Parity targets:
- ``bev_pool_v2`` CUDA kernel
  (reference ``ops/bev_pool_v2/src/bev_pool_cuda.cu:21-48``): for each
  output cell ``out[cell, c] = sum_i depth[ranks_depth[i]] *
  feat[ranks_feat[i], c]`` over the cell's rank-sorted interval; the
  Python wrapper + self-test live in ``ops/bev_pool_v2/bev_pool.py``.
- ``bev_pool`` v1 (``ops/bev_pool/bev_pool_cuda.cu``): plain
  (N, C) feature + (N, 4) voxel-coordinate scatter.

On TPU both collapse to one linear scatter-add; XLA differentiates it
for free (the CUDA backward's interval bookkeeping disappears).  The
model-level ``lss_splat`` avoids materializing the full (P, C)
depth-weighted product by chunking over the depth axis inside a
``fori_loop``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bev_pool_v2(depth: jnp.ndarray,
                feat: jnp.ndarray,
                ranks_depth: jnp.ndarray,
                ranks_feat: jnp.ndarray,
                ranks_bev: jnp.ndarray,
                bev_feat_shape: Sequence[int],
                interval_starts: jnp.ndarray = None,
                interval_lengths: jnp.ndarray = None,
                valid: jnp.ndarray = None) -> jnp.ndarray:
    """Reference-compatible bev_pool_v2.

    Args:
        depth: any shape, flattened for indexing (e.g. (B, N, D, H, W)).
        feat: (..., C), flattened to (num_feat, C).
        ranks_depth/ranks_feat/ranks_bev: (P,) int32 point bookkeeping.
        bev_feat_shape: (B, Z, Y, X, C) output shape.
        interval_*: accepted for API parity; the segment-sum formulation
            does not need them.
        valid: optional (P,) mask; invalid points are dropped.

    Returns:
        (B, Z, Y, X, C) pooled features.
    """
    b, z, y, x, c = bev_feat_shape
    n_cells = b * z * y * x
    depth_flat = depth.reshape(-1)
    feat_flat = feat.reshape(-1, c)

    weights = depth_flat[ranks_depth]
    rows = feat_flat[ranks_feat]
    updates = rows * weights[:, None]
    ids = ranks_bev
    if valid is not None:
        ids = jnp.where(valid, ids, n_cells)   # OOB => dropped
    out = jnp.zeros((n_cells, c), feat.dtype).at[ids].add(
        updates, mode='drop')
    return out.reshape(b, z, y, x, c)


def lss_splat(depth: jnp.ndarray,
              feat: jnp.ndarray,
              voxel_ids: jnp.ndarray,
              n_cells: int,
              chunk_d: int = 4) -> jnp.ndarray:
    """Model-level LSS splat without materializing the (P, C) product.

    Args:
        depth: (N, D, H, W) softmax depth distributions (one sample).
        feat: (N, H, W, C) camera features.
        voxel_ids: (N, D, H, W) int32 flattened BEV cell id per frustum
            point; out-of-range ids (>= n_cells) are dropped.
        n_cells: number of output cells (Z * Y * X).
        chunk_d: depth bins processed per loop step (memory knob).

    Returns:
        (n_cells, C) pooled features.
    """
    n, d, h, w, = depth.shape
    c = feat.shape[-1]
    pad_d = (-d) % chunk_d
    if pad_d:
        depth = jnp.concatenate(
            [depth, jnp.zeros((n, pad_d, h, w), depth.dtype)], axis=1)
        voxel_ids = jnp.concatenate(
            [voxel_ids, jnp.full((n, pad_d, h, w), n_cells, jnp.int32)],
            axis=1)
    n_chunks = depth.shape[1] // chunk_d

    def body(i, acc):
        dep = jax.lax.dynamic_slice_in_dim(depth, i * chunk_d, chunk_d, 1)
        ids = jax.lax.dynamic_slice_in_dim(voxel_ids, i * chunk_d, chunk_d, 1)
        # (N, chunk, H, W, C) weighted features.
        upd = feat[:, None] * dep[..., None]
        return acc.at[ids.reshape(-1)].add(upd.reshape(-1, c), mode='drop')

    acc = jnp.zeros((n_cells + 1, c), feat.dtype)  # +1 slot absorbs drops
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    return acc[:n_cells]


def frustum_voxel_ids(frustum: jnp.ndarray,
                      cam2lidar_rots: jnp.ndarray,
                      cam2lidar_trans: jnp.ndarray,
                      bev_start: Sequence[float],
                      bev_voxel: Sequence[float],
                      bev_nx: Sequence[int]) -> jnp.ndarray:
    """Project the camera frustum into flattened BEV voxel ids.

    Parity: ``get_geometry`` + ``voxel_pooling_prepare_v2``
    (reference ``cam_stream_lss_bevpoolv2.py:229-351``) with the kept /
    sort / interval machinery replaced by out-of-range sentinel ids.

    Args:
        frustum: (D, H, W, 3) image-plane (u, v, depth) points.
        cam2lidar_rots: (N, 3, 3) per-camera img->lidar rotation
            (already folded with the intrinsic inverse).
        cam2lidar_trans: (N, 3).
        bev_start: (x0, y0, z0) = bx - dx/2 grid origin.
        bev_voxel: (dx, dy, dz).
        bev_nx: (nx, ny, nz).

    Returns:
        (N, D, H, W) int32 ids = ((z * ny) + y) * nx + x, or
        nx*ny*nz for out-of-range points.
    """
    nx, ny, nz = bev_nx
    pts = jnp.concatenate([
        frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1)
    pts = jnp.einsum('nij,dhwj->ndhwi', cam2lidar_rots, pts)
    pts = pts + cam2lidar_trans[:, None, None, None, :]

    cx = jnp.floor((pts[..., 0] - bev_start[0]) / bev_voxel[0]).astype(jnp.int32)
    cy = jnp.floor((pts[..., 1] - bev_start[1]) / bev_voxel[1]).astype(jnp.int32)
    cz = jnp.floor((pts[..., 2] - bev_start[2]) / bev_voxel[2]).astype(jnp.int32)
    ok = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
          & (cz >= 0) & (cz < nz))
    ids = (cz * ny + cy) * nx + cx
    return jnp.where(ok, ids, nx * ny * nz)
