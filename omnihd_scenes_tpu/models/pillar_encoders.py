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


class _DenseKernelVar(nn.Module):
    """Declares exactly ``nn.Dense(use_bias=False)``'s parameter tree
    (``kernel``, lecun-normal, f32) and returns the kernel itself, so
    the folded PFN can use the weight matrix directly while staying
    checkpoint-interchangeable with :class:`PFNLayer`."""

    features: int

    @nn.compact
    def __call__(self, d_in: int):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (d_in, self.features))


class _BNVars(nn.Module):
    """Declares exactly ``nn.BatchNorm``'s variable tree (params
    scale/bias, batch_stats mean/var) and returns the raw tensors."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        return scale, bias, mean.value, var.value


class _FoldedPFN(nn.Module):
    """Single PFN layer with frozen BN+ReLU folded through the pillar
    max-pool.  Parameter/stat tree is identical to :class:`PFNLayer`
    (``Dense_0/kernel``, ``BatchNorm_0/{scale,bias}`` + batch_stats
    ``{mean,var}``) — checkpoints are interchangeable.

    Identity used (per channel c, per pillar):
        max_i relu(g_c (y_i,c − m_c) + b_c)
          = relu(|g_c| M_c − g_c m_c + b_c),   M_c = max_i sign(g_c) y_i,c
    valid because relu∘affine is monotone with direction sign(g_c) and
    max over points commutes with per-channel monotone maps; g_c = 0
    degenerates to the constant relu(b_c), which the identity also
    yields (|g|M = g m = 0).  Exact up to float reassociation
    (tests/test_dense_pillars.py pins the tolerance).
    """

    features: int

    @nn.compact
    def __call__(self, f0, means, blocks, valid, lin, counts, bhw):
        from jax import lax

        w = _DenseKernelVar(self.features, name='Dense_0')(f0.shape[-1])
        scale, bias, mu, var = _BNVars(self.features, name='BatchNorm_0')()
        y = jnp.dot(f0, w)                               # (B*N, C)
        g = scale * lax.rsqrt(var + BN_EPS)              # frozen BN affine
        b_fold = bias - mu * g
        s = jnp.where(g >= 0, 1.0, -1.0).astype(y.dtype)
        neg = jnp.asarray(-jnp.inf, y.dtype)
        pooled = jnp.full((bhw, self.features), neg, y.dtype).at[lin].max(
            jnp.where(valid[:, None], y * s, neg), mode='drop')
        m = jnp.zeros((), y.dtype)
        for r, c, wd in blocks:                          # pillar-mean term
            m = m + jnp.dot(means[:, c:c + wd], w[r:r + wd])
        out = nn.relu(jnp.abs(g) * pooled - g * m + b_fold)
        return jnp.where(counts > 0, out, 0.0)


class _PointDenseBNReLU(nn.Module):
    """Per-point Linear(no bias) -> BN -> ReLU — the PFNLayer compute
    without the pooling, with identical submodule names (``Dense_0``,
    ``BatchNorm_0``) so its param tree is interchangeable with
    :class:`PFNLayer`'s."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name)(x)
        return nn.relu(x)


class DensePillarEncoder(nn.Module):
    """Sort-free pillar encoding: points -> (H, W, C) BEV canvas.

    TPU-native reformulation of voxelize + PillarFeatureNet +
    PointPillarsScatter (reference ``Voxelization`` CUDA op +
    ``pillar_encoder.py:301-434`` + ``pts_middle_encoder``): instead of
    argsort-compacting points into a ``(max_voxels, max_points, D)``
    buffer, every pillar statistic is computed with dense
    scatter-add / scatter-max straight onto the BEV grid:

      counts/sums  = scatter-add over linearized pillar ids
      per-point augmentation (cluster/center/velocity offsets)
                   = gather of the pillar means back to the points
      PFN max-pool = scatter-max of the embedded points onto the canvas

    This removes the O(N log^2 N) TPU sort network and shrinks the PFN
    matmul from (max_voxels * max_points) padded rows to N rows.

    Semantics vs the capped path: ``max_voxels`` / ``max_points_per_
    voxel`` truncation does NOT apply — every in-range point
    contributes.  When no pillar exceeds the caps the result is
    bit-identical to PillarFeatureNet + scatter_to_bev (tested); above
    the caps the reference drops arbitrary sort-order tails while this
    keeps everything, which is at least as faithful.  Multi-layer PFNs
    broadcast the pooled canvas back to the points by gather.

    Parameter tree matches ``PillarFeatureNet`` exactly (``PFNLayer_i/
    {Dense_0,BatchNorm_0}``), so checkpoints are interchangeable.  BN
    batch statistics in training mode are computed over the N point
    rows rather than the padded voxel buffer, so use the capped path
    for training parity; this encoder is the inference/serving path.
    """

    feat_channels: Tuple[int, ...] = (64,)
    voxel_size: Sequence[float] = (0.25, 0.25, 8.0)
    point_cloud_range: Sequence[float] = (-60, -40, -3.0, 60, 40, 5.0)
    grid_hw: Tuple[int, int] = (320, 480)
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_velocity_snr_center: bool = False
    axis_name: Optional[str] = None
    # fold_bn=True (inference, single PFN layer only) additionally folds
    # the frozen BN+ReLU THROUGH the scatter-max pool, removing the
    # per-point means gather-back and the per-point BN/ReLU entirely:
    #   max_i relu(g*(y_i - m) + b) == relu(|g|*M - g*m + b),
    #   M = scatter_max(sign(g) * y_i)
    # (relu∘affine is per-channel monotone with direction sign(g), and
    # max commutes with monotone maps; m = the pillar-mean term of the
    # PFN linear layer, computable per PILLAR from the scatter-add sums
    # instead of per point).  Exact up to float reassociation.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        # points: (B, N, D) or (N, D) padded; points_mask matches.
        import jax.numpy as jnp

        squeeze = points.ndim == 2
        if squeeze:
            points, points_mask = points[None], points_mask[None]
        b, n, d = points.shape
        h, w = self.grid_hw
        hw = h * w
        x0, y0, z0, x1, y1, z1 = self.point_cloud_range
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        dt = points.dtype

        pts = points.reshape(b * n, d)
        ix = jnp.floor((pts[:, 0] - x0) / vx).astype(jnp.int32)
        iy = jnp.floor((pts[:, 1] - y0) / vy).astype(jnp.int32)
        valid = ((pts[:, 0] >= x0) & (pts[:, 0] < x1)
                 & (pts[:, 1] >= y0) & (pts[:, 1] < y1)
                 & (pts[:, 2] >= z0) & (pts[:, 2] < z1)
                 & points_mask.reshape(b * n).astype(bool))
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        # Fold batch into the pillar id: one scatter over (B*H*W, C).
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        cell = bidx * hw + iy * w + ix
        lin = jnp.where(valid, cell, b * hw)           # sentinel -> dropped
        lin_g = jnp.where(valid, cell, 0)              # safe gather index

        # One scatter-add for every pillar statistic: [1, xyz, (v)].
        stat_cols = [jnp.ones_like(pts[:, :1]), pts[:, :3]]
        if self.with_velocity_snr_center:
            stat_cols.append(pts[:, 3:7])
        stats = jnp.where(valid[:, None],
                          jnp.concatenate(stat_cols, axis=-1), 0.0)
        sums = jnp.zeros((b * hw, stats.shape[-1]), dt).at[lin].add(
            stats, mode='drop')
        counts = sums[:, :1]
        means = sums[:, 1:] / jnp.clip(counts, 1.0, None)

        if self.fold_bn and not train and len(self.feat_channels) == 1:
            canvas = self._folded_single_layer(
                pts, ix, iy, valid, lin, means, counts, b, hw, dt)
            canvas = canvas.reshape(b, h, w, canvas.shape[-1])
            return canvas[0] if squeeze else canvas

        pmean = means[lin_g]                            # (B*N, 3 [+4])

        feats = [pts]
        if self.with_cluster_center:
            feats.append(pts[:, :3] - pmean[:, :3])
        if self.with_voxel_center:
            cx = ix.astype(dt) * vx + (vx / 2 + x0)
            cy = iy.astype(dt) * vy + (vy / 2 + y0)
            feats.append(jnp.stack([pts[:, 0] - cx,
                                    pts[:, 1] - cy], axis=-1))
        if self.with_velocity_snr_center:
            feats.append(pts[:, 3:7] - pmean[:, 3:])
        x = jnp.where(valid[:, None], jnp.concatenate(feats, axis=-1), 0.0)

        n_layers = len(self.feat_channels)
        canvas = None
        for i, ch in enumerate(self.feat_channels):
            x = _PointDenseBNReLU(ch, axis_name=self.axis_name,
                                  name=f'PFNLayer_{i}')(x, train)
            neg = jnp.asarray(-jnp.inf, x.dtype)
            canvas = jnp.full((b * hw, ch), neg, x.dtype).at[lin].max(
                jnp.where(valid[:, None], x, neg), mode='drop')
            canvas = jnp.where(counts > 0, canvas, 0.0)
            if i != n_layers - 1:
                x = jnp.concatenate([x, canvas[lin_g]], axis=-1)
                x = jnp.where(valid[:, None], x, 0.0)
        canvas = canvas.reshape(b, h, w, canvas.shape[-1])
        return canvas[0] if squeeze else canvas

    def _folded_single_layer(self, pts, ix, iy, valid, lin, means, counts,
                             b, hw, dt):
        """BN+ReLU folded through the max-pool (``fold_bn`` docs above).

        Per point only the linear projection of the mean-FREE feature
        vector ``f0`` is computed (mean-offset blocks replaced by their
        raw minuends — the linear layer splits as W@f = W@f0 − W_sub@mean);
        the pillar-mean term, the frozen BN affine and the ReLU all move
        to per-PILLAR arithmetic on the canvas.  No 160k-row gather-back,
        and the stats scatter-add and the feature scatter-max become
        independent (XLA overlaps them).
        """
        d = pts.shape[-1]
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        vx, vy = self.voxel_size[0], self.voxel_size[1]

        f0s = [pts]
        blocks = []          # (W row start, means col start, width)
        row = d
        if self.with_cluster_center:
            f0s.append(pts[:, :3])
            blocks.append((row, 0, 3))
            row += 3
        if self.with_voxel_center:
            cx = ix.astype(dt) * vx + (vx / 2 + x0)
            cy = iy.astype(dt) * vy + (vy / 2 + y0)
            f0s.append(jnp.stack([pts[:, 0] - cx, pts[:, 1] - cy], axis=-1))
            row += 2
        if self.with_velocity_snr_center:
            f0s.append(pts[:, 3:7])
            blocks.append((row, 3, 4))
            row += 4
        f0 = jnp.where(valid[:, None], jnp.concatenate(f0s, axis=-1), 0.0)
        return _FoldedPFN(self.feat_channels[0], name='PFNLayer_0')(
            f0, means, tuple(blocks), valid, lin, counts, b * hw)
