"""Conv+BN fusion (serve/fuse.py): dataflow-exact pairing + numerical
equivalence on real model trunks (reference tools/misc/fuse_conv_bn.py).
"""

import jax
import numpy as np
import pytest

from omnihd_scenes_tpu.serve.fuse import fuse_conv_bn, fuse_model, trace_pairs


def _randomize_bn(variables, seed=0):
    """Non-trivial running stats so fusion is actually exercised."""
    rng = np.random.RandomState(seed)

    def walk(p, s):
        for k, v in list(p.items()):
            if isinstance(v, dict):
                if k.startswith('BatchNorm') and 'scale' in v:
                    n = v['scale'].shape[0]
                    v['scale'] = (rng.rand(n) + 0.5).astype(np.float32)
                    v['bias'] = (rng.randn(n) * 0.1).astype(np.float32)
                    sv = s.get(k) if s else None
                    if sv is not None:
                        sv['mean'] = (rng.randn(n) * 0.3).astype(np.float32)
                        sv['var'] = (rng.rand(n) + 0.5).astype(np.float32)
                else:
                    walk(v, s.get(k, {}) if s else {})

    variables = jax.tree.map(np.asarray, dict(variables))
    walk(variables['params'], variables.get('batch_stats', {}))
    return variables


class TestFuseResNet:
    def test_resnet_block_equivalence(self):
        from omnihd_scenes_tpu.models.resnet import ResNet

        model = ResNet(depth=18, out_indices=(0, 1, 2, 3), frozen_bn=True)
        x = np.random.RandomState(0).randn(1, 32, 48, 3).astype(np.float32)
        variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x))

        def apply_fn(v):
            return model.apply(v, x, train=False)

        pairs, eps = trace_pairs(apply_fn, variables)
        assert pairs, 'no conv->BN pairs traced in a ResNet'
        fused, report = fuse_conv_bn(variables, pairs, eps)
        assert len(report['fused']) == len(pairs), report['skipped']

        want = apply_fn(variables)
        got = apply_fn(fused)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-4, atol=2e-4)

    def test_kernel_actually_changed(self):
        from omnihd_scenes_tpu.models.layers import ConvBNReLU

        model = ConvBNReLU(8)
        x = np.random.RandomState(1).randn(1, 8, 8, 4).astype(np.float32)
        variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x))
        fused, report = fuse_model(model, variables,
                                   lambda v: model.apply(v, x, train=False))
        assert report['fused'] and not report['skipped']
        assert not np.allclose(fused['params']['Conv_0']['kernel'],
                               variables['params']['Conv_0']['kernel'])
        # BN left as exact passthrough-plus-bias.
        np.testing.assert_array_equal(
            fused['batch_stats']['BatchNorm_0']['mean'], 0.0)
        np.testing.assert_allclose(
            np.asarray(model.apply(fused, x, train=False)),
            np.asarray(model.apply(variables, x, train=False)),
            rtol=2e-4, atol=2e-4)

    def test_unpaired_bn_untouched(self):
        """A BN whose input is not directly a conv output must be left
        alone (dataflow pairing, not name convention)."""
        import flax.linen as nn

        class Tricky(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = nn.Conv(8, (3, 3))(x)           # Conv_0
                y = y + 1.0                          # breaks the pair
                y = nn.BatchNorm(
                    use_running_average=not train)(y)  # BatchNorm_0
                z = nn.Conv(8, (1, 1))(y)           # Conv_1 -> paired
                z = nn.BatchNorm(
                    use_running_average=not train)(z)  # BatchNorm_1
                return z

        model = Tricky()
        x = np.random.RandomState(2).randn(1, 8, 8, 3).astype(np.float32)
        variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x))
        pairs, eps = trace_pairs(
            lambda v: model.apply(v, x, train=False), variables)
        assert ('BatchNorm_0',) not in pairs
        assert pairs.get(('BatchNorm_1',)) == ('Conv_1',)
        fused, report = fuse_conv_bn(variables, pairs, eps)
        np.testing.assert_allclose(
            np.asarray(model.apply(fused, x, train=False)),
            np.asarray(model.apply(variables, x, train=False)),
            rtol=2e-4, atol=2e-4)


class TestFuseGuards:
    def test_conv_feeding_two_bns_skipped(self):
        """A producer consumed by two BNs must not be folded: each fold
        would rescale the shared kernel again, corrupting both paths."""
        import flax.linen as nn

        class TwoBN(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = nn.Conv(8, (3, 3))(x)            # Conv_0, shared
                a = nn.BatchNorm(
                    use_running_average=not train)(y)  # BatchNorm_0
                b = nn.BatchNorm(
                    use_running_average=not train)(y)  # BatchNorm_1
                return a + b

        model = TwoBN()
        x = np.random.RandomState(3).randn(1, 8, 8, 3).astype(np.float32)
        variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x))
        fused, report = fuse_model(model, variables,
                                   lambda v: model.apply(v, x, train=False))
        assert not report['fused']
        assert len(report['skipped']) == 2
        np.testing.assert_array_equal(
            fused['params']['Conv_0']['kernel'],
            variables['params']['Conv_0']['kernel'])
        np.testing.assert_allclose(
            np.asarray(model.apply(fused, x, train=False)),
            np.asarray(model.apply(variables, x, train=False)),
            rtol=1e-6, atol=1e-6)

    def test_verify_catches_residual_consumer(self):
        """The verification backstop: a conv output feeding a residual
        path as well as its BN is invisible to the trace — the fused
        forward deviates on that path and fuse_model must raise."""
        import flax.linen as nn

        class Residual(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = nn.Conv(3, (3, 3))(x)            # Conv_0
                z = nn.BatchNorm(
                    use_running_average=not train)(y)  # BatchNorm_0
                return z + y                          # hidden consumer

        model = Residual()
        x = np.random.RandomState(4).randn(1, 8, 8, 3).astype(np.float32)
        variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x))
        with pytest.raises(ValueError, match='verification failed'):
            fuse_model(model, variables,
                       lambda v: model.apply(v, x, train=False))


class TestFuseFlagship:
    @pytest.mark.slow
    def test_bevfusion_equivalence(self):
        """End-to-end: the reduced flagship BEVFusion fuses everywhere
        the trace finds a pair and the detection head outputs match."""
        import __graft_entry__ as g
        from omnihd_scenes_tpu.models.bevfusion import BEVFusion

        model = BEVFusion(g._flagship_cfg(img_hw=(64, 112), depth_to=9.0,
                                          splat_impl='einsum'))
        batch = g._flagship_batch(1, n_pts=512, img_hw=(64, 112))
        variables = _randomize_bn(model.init(
            jax.random.PRNGKey(0), batch['points'], batch['points_mask'],
            batch['imgs'], batch['img2lidar_rots'],
            batch['img2lidar_trans'], train=False))

        def apply_fn(v):
            return model.apply(v, batch['points'], batch['points_mask'],
                               batch['imgs'], batch['img2lidar_rots'],
                               batch['img2lidar_trans'], train=False)

        fused, report = fuse_model(model, variables, apply_fn)
        assert len(report['fused']) >= 20, report
        want = apply_fn(variables)
        got = apply_fn(fused)
        for k in ('cls_score', 'bbox_pred', 'dir_pred'):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=5e-3, atol=5e-3)
