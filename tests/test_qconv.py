"""Fused int8 conv kernel (omnihd_scenes_tpu.ops.qconv).

The Pallas kernel must agree exactly with the XLA s8 conv + epilogue
reference (same int arithmetic, same f32 affine), and the float
wrapper must stay within PTQ noise of the float conv+BN.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.ops.qconv import (qconv3x3, qconv3x3_bn_relu,
                                         quantize_act, quantize_weights)


def _xla_ref(x8, w8, scale, shift, relu):
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    y32 = jax.lax.conv_general_dilated(
        x8, w8, (1, 1), 'SAME', dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * scale + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


@pytest.mark.parametrize('shape,co,relu', [
    ((2, 9, 17, 128), 128, True),
    ((1, 16, 24, 256), 128, False),
    ((3, 7, 33, 128), 256, True),
])
def test_qconv3x3_matches_xla_int_arithmetic(shape, co, relu):
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-127, 128, shape, dtype=np.int8))
    w8 = jnp.asarray(
        rng.randint(-127, 128, (3, 3, shape[-1], co), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, co).astype(np.float32))
    shift = jnp.asarray(rng.randn(co).astype(np.float32))

    got = qconv3x3(x8, w8, scale, shift, relu=relu, interpret=True)
    want = _xla_ref(x8, w8, scale, shift, relu)
    assert got.shape == want.shape
    # The integer conv is exact; the f32 epilogue may differ by one FMA
    # rounding, which can flip the final bf16 ulp.
    g16 = np.asarray(got).view(np.uint16).astype(np.int64)
    w16 = np.asarray(want).view(np.uint16).astype(np.int64)
    ulp = np.abs(g16 - w16)
    assert ulp.max() <= 1, (ulp.max(), (ulp > 0).mean())
    assert (ulp > 0).mean() < 1e-3


def test_qconv_bn_relu_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 20, 128).astype(np.float32))
    kernel = jnp.asarray(
        (rng.randn(3, 3, 128, 128) * 0.05).astype(np.float32))
    bn_scale = jnp.asarray(rng.uniform(0.5, 2.0, 128).astype(np.float32))
    bn_shift = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    amax = jnp.max(jnp.abs(x))

    got = qconv3x3_bn_relu(x, kernel, amax, bn_scale, bn_shift,
                           interpret=True).astype(jnp.float32)

    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    yf = jax.lax.conv_general_dilated(x, kernel, (1, 1), 'SAME',
                                      dimension_numbers=dn)
    want = np.maximum(yf * bn_scale + bn_shift, 0.0)

    a = np.asarray(got, np.float64).ravel()
    b = np.asarray(want, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))
    assert rel < 0.05, rel


def test_quantize_roundtrip_helpers():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    x8, sx = quantize_act(x, jnp.max(jnp.abs(x)))
    assert x8.dtype == jnp.int8
    assert float(jnp.max(jnp.abs(x8.astype(jnp.float32) * sx - x))) < \
        float(sx) * 0.51
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    w8, sw = quantize_weights(k)
    assert w8.dtype == jnp.int8 and sw.shape == (16,)
    assert float(jnp.max(jnp.abs(w8 * sw - k))) <= float(jnp.max(sw)) * 0.51
