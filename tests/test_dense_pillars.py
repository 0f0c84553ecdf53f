"""DensePillarEncoder ≡ voxelize + PillarFeatureNet + scatter_to_bev.

The sort-free scatter formulation (models/pillar_encoders.py:
DensePillarEncoder) must agree with the capped reference-semantics
path whenever no pillar exceeds ``max_points_per_voxel`` and the voxel
count stays under ``max_voxels`` — the caps are the only semantic
difference.  Reference being matched by both: mmdet3d ``Voxelization``
+ ``pillar_encoder.py:301-434`` + ``pts_middle_encoder``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.pillar_encoders import (DensePillarEncoder,
                                                      PillarFeatureNet)
from omnihd_scenes_tpu.ops.voxelize import scatter_to_bev, voxelize

PC_RANGE = (-8.0, -4.0, -3.0, 8.0, 4.0, 5.0)
VOX = (0.5, 0.5, 8.0)
GRID = (16, 32)  # (y, x) bins


def _points(rng, n, n_valid, radar=False):
    d = 8 if radar else 4
    pts = rng.uniform(-10, 10, size=(n, d)).astype(np.float32)
    pts[:, 1] = rng.uniform(-5, 5, size=n)
    pts[:, 2] = rng.uniform(-2.5, 4.5, size=n)
    mask = np.arange(n) < n_valid
    return pts, mask


def _sorted_canvas(variables, pts, mask, feat_channels, radar,
                   max_voxels=512, max_points=32):
    vox = voxelize(jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOX,
                   max_voxels, max_points)
    pfn = PillarFeatureNet(feat_channels=feat_channels, voxel_size=VOX,
                           point_cloud_range=PC_RANGE,
                           with_velocity_snr_center=radar)
    pf = pfn.apply(variables, vox.features, vox.num_points, vox.coords,
                   train=False)
    pf = jnp.where(vox.valid[..., None], pf, 0.0)
    return scatter_to_bev(pf, vox.coords, vox.valid, GRID)


def _dense(feat_channels, radar):
    return DensePillarEncoder(feat_channels=feat_channels, voxel_size=VOX,
                              point_cloud_range=PC_RANGE, grid_hw=GRID,
                              with_velocity_snr_center=radar)


@pytest.mark.parametrize('radar', [False, True])
def test_dense_matches_sorted_single_layer(radar):
    rng = np.random.RandomState(0)
    pts, mask = _points(rng, 512, 400, radar)
    enc = _dense((64,), radar)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask), train=False)
    dense = enc.apply(variables, jnp.asarray(pts), jnp.asarray(mask),
                      train=False)
    srt = _sorted_canvas(variables, pts, mask, (64,), radar)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(srt),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dense_matches_sorted_two_layer():
    # Multi-layer PFN: pooled canvas broadcast back to the points.
    rng = np.random.RandomState(1)
    pts, mask = _points(rng, 256, 200)
    enc = _dense((32, 64), False)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask), train=False)
    dense = enc.apply(variables, jnp.asarray(pts), jnp.asarray(mask),
                      train=False)
    srt = _sorted_canvas(variables, pts, mask, (32, 64), False)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(srt),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dense_batched_equals_per_sample():
    rng = np.random.RandomState(2)
    p0, m0 = _points(rng, 300, 250)
    p1, m1 = _points(rng, 300, 120)
    enc = _dense((64,), False)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(p0),
                         jnp.asarray(m0), train=False)
    batched = enc.apply(variables, jnp.stack([p0, p1]),
                        jnp.stack([m0, m1]), train=False)
    for i, (p, m) in enumerate([(p0, m0), (p1, m1)]):
        single = enc.apply(variables, jnp.asarray(p), jnp.asarray(m),
                           train=False)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('radar', [False, True])
def test_fold_bn_matches_dense(radar):
    """fold_bn=True (BN+ReLU folded through the scatter-max) must agree
    with the plain dense path — including channels with NEGATIVE BN
    scale, where max_i g*y_i = g*min_i y_i and the fold must flip the
    extremum via the sign trick."""
    rng = np.random.RandomState(5)
    pts, mask = _points(rng, 512, 400, radar)
    enc = _dense((64,), radar)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask), train=False)

    # Non-trivial frozen BN: random running stats, mixed-sign scales.
    v = jax.tree_util.tree_map(np.asarray, variables)
    bn_p = v['params']['PFNLayer_0']['BatchNorm_0']
    bn_s = v['batch_stats']['PFNLayer_0']['BatchNorm_0']
    bn_p['scale'] = rng.uniform(-1.5, 1.5, 64).astype(np.float32)
    bn_p['scale'][:4] = 0.0                        # g == 0 degenerate
    bn_p['bias'] = rng.uniform(-1, 1, 64).astype(np.float32)
    bn_s['mean'] = rng.uniform(-2, 2, 64).astype(np.float32)
    bn_s['var'] = rng.uniform(0.1, 3.0, 64).astype(np.float32)

    plain = enc.apply(v, jnp.asarray(pts), jnp.asarray(mask), train=False)
    folded = DensePillarEncoder(
        feat_channels=(64,), voxel_size=VOX, point_cloud_range=PC_RANGE,
        grid_hw=GRID, with_velocity_snr_center=radar, fold_bn=True).apply(
            v, jnp.asarray(pts), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)


def test_fold_bn_flagship_knob_and_sorted_parity():
    """pillar_impl='dense_fold' end-to-end on BEVFusion equals the
    sorted reference path (fresh BN stats: identity affine)."""
    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)
    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig

    def cfg(impl):
        return BEVFusionConfig(
            camera_stream=False, lc_fusion=False, se=False,
            pillars=PointPillarsConfig(
                point_cloud_range=PC_RANGE, voxel_size=VOX, bev_hw=GRID,
                max_voxels=512, max_points_per_voxel=32,
                second_layer_nums=(1,), second_strides=(2,),
                second_channels=(32,), fpn_strides=(1,),
                fpn_channels=(32,), pillar_impl=impl))

    rng = np.random.RandomState(6)
    pts, mask = _points(rng, 512, 400, radar=True)
    pts_b, mask_b = jnp.asarray(pts[None]), jnp.asarray(mask[None])

    m_sorted = BEVFusion(cfg('sorted'))
    variables = m_sorted.init(jax.random.PRNGKey(0), pts_b, mask_b,
                              train=False)
    out_s = m_sorted.apply(variables, pts_b, mask_b, train=False)
    out_f = BEVFusion(cfg('dense_fold')).apply(variables, pts_b, mask_b,
                                               train=False)
    np.testing.assert_allclose(np.asarray(out_f['cls_score']),
                               np.asarray(out_s['cls_score']),
                               rtol=1e-4, atol=1e-4)


def test_params_interchangeable_with_pillar_feature_net():
    """A PillarFeatureNet param tree loads straight into the dense
    encoder (checkpoint compatibility both ways)."""
    rng = np.random.RandomState(3)
    pts, mask = _points(rng, 256, 200)
    pfn = PillarFeatureNet(feat_channels=(64,), voxel_size=VOX,
                           point_cloud_range=PC_RANGE)
    vox = voxelize(jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOX,
                   512, 32)
    pfn_vars = pfn.init(jax.random.PRNGKey(7), vox.features,
                        vox.num_points, vox.coords, train=False)
    enc = _dense((64,), False)
    dense = enc.apply(pfn_vars, jnp.asarray(pts), jnp.asarray(mask),
                      train=False)
    srt = _sorted_canvas(pfn_vars, pts, mask, (64,), False)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(srt),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_flagship_config_knob():
    """BEVFusion(pillar_impl='dense') runs with params initialized by
    the sorted path — radar-only small config."""
    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)
    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig

    def cfg(impl):
        return BEVFusionConfig(
            camera_stream=False, lc_fusion=False, se=False,
            pillars=PointPillarsConfig(
                point_cloud_range=PC_RANGE, voxel_size=VOX, bev_hw=GRID,
                max_voxels=512, max_points_per_voxel=32,
                second_layer_nums=(1,), second_strides=(2,),
                second_channels=(32,), fpn_strides=(1,),
                fpn_channels=(32,), pillar_impl=impl))

    rng = np.random.RandomState(4)
    pts, mask = _points(rng, 512, 400, radar=True)
    pts_b, mask_b = jnp.asarray(pts[None]), jnp.asarray(mask[None])

    m_sorted = BEVFusion(cfg('sorted'))
    variables = m_sorted.init(jax.random.PRNGKey(0), pts_b, mask_b,
                              train=False)
    out_s = m_sorted.apply(variables, pts_b, mask_b, train=False)
    m_dense = BEVFusion(cfg('dense'))
    out_d = m_dense.apply(variables, pts_b, mask_b, train=False)
    np.testing.assert_allclose(np.asarray(out_d['cls_score']),
                               np.asarray(out_s['cls_score']),
                               rtol=1e-4, atol=1e-4)
