"""BEVFusionConfig.remat: checkpoint/param-tree compatibility + exactness.

The remat knob wraps the heavy trunks (ResNet, FPNC, LiftSplatShoot,
SECOND, SECONDFPN) in ``nn.remat`` so the backward pass recomputes
trunk activations instead of saving them — required to fit train
batch > 1 on a 16 GB chip (un-rematted b=4 needs 22.7 GB, BENCH.md
round 3).  ``nn.remat`` renames module scopes, so the trunks pin their
pre-remat auto-names; these tests guard that contract:

  * identical param/batch_stats trees in both modes (checkpoints are
    interchangeable),
  * bit-comparable forward,
  * matching gradients (remat changes scheduling, not math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.bevfusion import BEVFusion, BEVFusionConfig
from omnihd_scenes_tpu.models.detectors import PointPillarsConfig
from omnihd_scenes_tpu.models.lss import LSSConfig


def _cfg(remat, exclude=(), parts=()):
    return BEVFusionConfig(
        remat=remat, remat_exclude=exclude,
        num_views=2, imc=16, lic=24, resnet_depth=18,
        resnet_out_indices=(1, 2, 3),
        lss=LSSConfig(final_dim=(64, 96), downsample=8,
                      camera_depth_range=(1.0, 13.0, 1.0),
                      pc_range=(-16, -16, -3.0, 16, 16, 5.0),
                      grid=2.0, inputC=16, camC=16, outC=16,
                      splat_mode='sample', splat_impl='einsum',
                      remat_parts=parts),
        pillars=PointPillarsConfig(
            point_cloud_range=(-16, -16, -3, 16, 16, 5),
            voxel_size=(0.5, 0.5, 8.0), bev_hw=(64, 64),
            pfn_channels=(16,), num_classes=4))


@pytest.fixture(scope='module')
def inputs():
    rng = np.random.RandomState(0)
    return (rng.randn(1, 64, 8).astype(np.float32),
            np.ones((1, 64), bool),
            rng.randn(1, 2, 64, 96, 3).astype(np.float32),
            np.tile(np.eye(3, dtype=np.float32) * 0.02, (1, 2, 1, 1)),
            np.zeros((1, 2, 3), np.float32))


@pytest.mark.slow
def test_remat_param_tree_forward_and_grads_match(inputs):
    pts, msk, imgs, rots, trans = inputs
    res = {}
    # Third mode: selective remat (radar trunks + LSS whole excluded,
    # DepthNet alone rematted inside LSS) — the BENCH.md "Selective
    # remat" training configuration; must be tree/forward/grad-identical
    # to both full-remat and no-remat.
    modes = {False: _cfg(False), True: _cfg(True),
             'selective': _cfg(True,
                               exclude=('second', 'secondfpn', 'lss'),
                               parts=('depthnet',))}
    for remat, cfg in modes.items():
        model = BEVFusion(cfg)
        v = model.init(jax.random.PRNGKey(0), pts, msk, imgs, rots,
                       trans, train=False)
        fwd = model.apply(v, pts, msk, imgs, rots, trans, train=False)

        def loss(p, model=model, v=v):
            out, _ = model.apply(
                {'params': p, 'batch_stats': v['batch_stats']},
                pts, msk, imgs, rots, trans, train=True,
                mutable=['batch_stats'])
            return (jnp.sum(out['cls_score'] ** 2)
                    + jnp.sum(out['depth'] ** 2))

        grads = jax.jit(jax.grad(loss))(v['params'])
        res[remat] = (v, np.asarray(fwd['cls_score']), grads)

    for mode in (True, 'selective'):
        # Checkpoint compatibility: identical variable trees.
        assert (jax.tree_util.tree_structure(res[False][0])
                == jax.tree_util.tree_structure(res[mode][0])), mode
        for a, b in zip(jax.tree.leaves(res[False][0]),
                        jax.tree.leaves(res[mode][0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Same math.
        np.testing.assert_allclose(res[False][1], res[mode][1],
                                   rtol=1e-5, atol=1e-5)
        for ga, gb in zip(jax.tree.leaves(res[False][2]),
                          jax.tree.leaves(res[mode][2])):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-3, atol=1e-4)
