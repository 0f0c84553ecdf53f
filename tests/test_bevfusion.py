"""BEVFusion / LSS model tests on tiny shapes (CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.bevfusion import (BEVFusion, BEVFusionConfig,
                                                depth_dist_loss)
from omnihd_scenes_tpu.models.detectors import PointPillarsConfig
from omnihd_scenes_tpu.models.lss import LSSConfig

TINY_LSS = LSSConfig(
    final_dim=(64, 96),
    downsample=8,
    camera_depth_range=(1.0, 9.0, 1.0),   # D = 8
    pc_range=(-8, -8, -3.0, 8, 8, 5.0),
    grid=1.0,                              # 16 x 16 x 8 voxels
    num_views=2,
    inputC=32,
    camC=16,
    outC=32,
)

TINY_PILLARS = PointPillarsConfig(
    point_cloud_range=(-8, -8, -3.0, 8, 8, 5.0),
    voxel_size=(0.5, 0.5, 8.0),
    max_voxels=128,
    max_points_per_voxel=4,
    bev_hw=(32, 32),
    pfn_channels=(16,),
    second_channels=(16, 16, 32),
    fpn_channels=(16, 16, 16),
    anchor_ranges=((-8, -8, 0.0, 8, 8, 0.0),) * 4,
)

TINY_FUSION = BEVFusionConfig(
    imc=32, lic=48, resnet_depth=18, resnet_out_indices=(1, 2, 3),
    lss=TINY_LSS, pillars=TINY_PILLARS, use_depthnet=True)


def _inputs(b=1):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-8, 8, (b, 256, 8)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 4, (b, 256))
    pmask = np.ones((b, 256), bool)
    imgs = rng.randn(b, 2, 64, 96, 3).astype(np.float32)
    # img->lidar: cameras looking forward from origin-ish.
    rots = np.tile(np.eye(3, dtype=np.float32), (b, 2, 1, 1)) * 0.02
    trans = np.zeros((b, 2, 3), np.float32)
    return pts, pmask, imgs, rots, trans


class TestBEVFusionForward:
    @pytest.mark.slow
    def test_fusion_shapes(self):
        model = BEVFusion(TINY_FUSION)
        pts, pmask, imgs, rots, trans = _inputs()
        variables = model.init(jax.random.PRNGKey(0), pts, pmask, imgs,
                               rots, trans, train=False)
        out = model.apply(variables, pts, pmask, imgs, rots, trans,
                          train=False)
        h, w = TINY_PILLARS.head_hw
        assert out['cls_score'].shape == (1, h, w, 8 * 4)
        assert out['bev'].shape[-1] == TINY_FUSION.lic
        assert out['depth'].shape == (1, 2, 8, 12, 8)  # (B,N,fH,fW,D)
        assert np.all(np.isfinite(np.asarray(out['cls_score'])))

    def test_camera_only(self):
        cfg = BEVFusionConfig(
            radar_stream=False, lc_fusion=False, se=False,
            use_depthnet=False, imc=32, resnet_depth=18,
            lss=TINY_LSS, pillars=TINY_PILLARS)
        model = BEVFusion(cfg)
        _, _, imgs, rots, trans = _inputs()
        variables = model.init(jax.random.PRNGKey(0), None, None, imgs,
                               rots, trans, train=False)
        out = model.apply(variables, None, None, imgs, rots, trans,
                          train=False)
        # Camera-only BEV is the LSS grid (ny=16, nx=16).
        assert out['bev'].shape == (1, 16, 16, TINY_LSS.outC)
        assert out['depth_logits'] is None  # CamEncode variant

    @pytest.mark.slow
    def test_depth_softmax_normalized(self):
        model = BEVFusion(TINY_FUSION)
        pts, pmask, imgs, rots, trans = _inputs()
        variables = model.init(jax.random.PRNGKey(0), pts, pmask, imgs,
                               rots, trans, train=False)
        out = model.apply(variables, pts, pmask, imgs, rots, trans,
                          train=False)
        s = np.asarray(out['depth']).sum(-1)
        assert np.allclose(s, 1.0, atol=1e-5)


class TestDepthLoss:
    def test_kld_zero_for_matching(self):
        rng = np.random.RandomState(0)
        gt = jax.nn.softmax(jnp.asarray(rng.randn(4, 6, 8)), axis=-1)
        min_depth = jnp.full((4, 6), 5.0)
        loss = depth_dist_loss(gt, gt, min_depth, (1.0, 9.0, 1.0))
        assert float(loss) < 1e-3

    def test_kld_positive_for_mismatch(self):
        rng = np.random.RandomState(0)
        gt = jax.nn.softmax(jnp.asarray(rng.randn(4, 6, 8)) * 3, axis=-1)
        pred = jax.nn.softmax(jnp.asarray(rng.randn(4, 6, 8)) * 3, axis=-1)
        min_depth = jnp.full((4, 6), 5.0)
        loss = depth_dist_loss(pred, gt, min_depth, (1.0, 9.0, 1.0))
        assert float(loss) > 0.05

    def test_mask_excludes_unobserved(self):
        gt = jnp.ones((2, 2, 8)) / 8
        pred = jnp.ones((2, 2, 8)) / 8
        # min_depth 0 -> outside [1, 9] range -> masked out entirely.
        loss = depth_dist_loss(pred, gt, jnp.zeros((2, 2)), (1.0, 9.0, 1.0))
        assert float(loss) == 0.0


class TestGaussianDepthTarget:
    def test_distribution_properties(self):
        from omnihd_scenes_tpu.data.depth_loading import gaussian_depth_target

        depth = np.zeros((16, 16), np.float32)
        depth[4, 4] = 5.0   # single observation in one patch
        dist, mins = gaussian_depth_target(depth, 4, (1.0, 17.0, 1.0))
        assert dist.shape == (4, 4, 16)
        assert mins[1, 1] == 5.0
        assert mins[0, 0] == 0.0
        # Distribution peaks at the observed bin (depth 5 -> bin idx 4).
        assert np.argmax(dist[1, 1]) == 4
        assert abs(dist[1, 1].sum() - 1.0) < 0.05
