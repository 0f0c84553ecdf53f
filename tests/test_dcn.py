"""DCNv2 (modulated deformable conv) tests.

Reference semantics: mmcv ``ModulatedDeformConv2dPack`` as used by the
R101-DCN BEVFormer backbone (``bevformer_T_R101.py``): zero-init offset
conv => at init DCN(x) == 0.5 * Conv3x3(x); arbitrary offsets follow
bilinear ``grid_sample`` with zero padding.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.dcn import DeformConv
from omnihd_scenes_tpu.models.resnet import ResNet


def test_init_equals_half_plain_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 4).astype(np.float32)
    m = DeformConv(6)
    v = m.init(jax.random.PRNGKey(1), x)
    got = m.apply(v, x)

    kern = np.asarray(v['params']['kernel']).reshape(3, 3, 4, 6)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kern), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(got, 0.5 * np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_stride2_shape_and_init_value():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 10, 3).astype(np.float32)
    m = DeformConv(5, strides=2)
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x)
    assert got.shape == (1, 4, 5, 5)
    kern = np.asarray(v['params']['kernel']).reshape(3, 3, 3, 5)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kern), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(got, 0.5 * np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_integer_offset_shifts_taps():
    """With offset (+1, 0) on every tap and mask logits forced high,
    DCN equals a conv over the input shifted by one column."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 7, 9, 2).astype(np.float32)
    m = DeformConv(3)
    v = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(np.asarray, v['params'])
    # conv_offset raw channels (mmcv interleave): dy0,dx0,dy1,dx1,...
    # then mask(9).
    bias = np.zeros(27, np.float32)
    bias[1:18:2] = 1.0        # off_x = +1 on every tap
    bias[18:] = 40.0          # sigmoid -> 1.0
    params['conv_offset']['bias'] = bias
    got = np.asarray(m.apply({'params': params}, x))

    x_shift = np.concatenate([x[:, :, 1:], np.zeros_like(x[:, :, :1])],
                             axis=2)
    kern = params['kernel'].reshape(3, 3, 2, 3)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift), jnp.asarray(kern), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # Interior matches exactly; both column borders differ (the
    # shifted-input conv reads zero padding where DCN's shifted taps
    # still fall inside the image) — compare away from them.
    np.testing.assert_allclose(got[:, :, 1:-2], np.asarray(want)[:, :, 1:-2],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_gradients_flow_and_resnet_dcn_trains():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    model = ResNet(depth=18, out_indices=(3,),
                   stage_with_dcn=(False, False, True, True))
    v = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = model.apply({'params': p, 'batch_stats': v['batch_stats']},
                          x, train=False)
        return sum(jnp.sum(o ** 2) for o in out)

    g = jax.grad(loss)(v['params'])
    norms = jax.tree.map(lambda a: float(jnp.abs(a).sum()), g)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(flat))
    # Offset convs get gradient signal too.
    leaf_paths = jax.tree_util.tree_flatten_with_path(g)[0]
    off_grads = [float(jnp.abs(v).sum()) for p, v in leaf_paths
                 if 'conv_offset' in str(p)]
    assert off_grads and any(val > 0 for val in off_grads)
