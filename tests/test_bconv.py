"""Fused bf16 conv kernel (ops/bconv.py): interpret-mode parity vs the
XLA conv with identical arithmetic (bf16 MXU, f32 accumulate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.ops.bconv import bconv3x3, bconv3x3_reference


@pytest.mark.parametrize('dilation', [1, 2, 6])
@pytest.mark.parametrize('shape', [(2, 16, 24, 128), (1, 8, 40, 256)])
def test_parity_vs_xla(shape, dilation):
    rng = np.random.RandomState(dilation * 10 + shape[1])
    n, h, w, c = shape
    co = 128
    x = rng.randn(*shape).astype(np.float32)
    k = (rng.randn(3, 3, c, co) * 0.05).astype(np.float32)
    scale = (rng.rand(co) + 0.5).astype(np.float32)
    shift = (rng.randn(co) * 0.1).astype(np.float32)

    got = bconv3x3(jnp.asarray(x), jnp.asarray(k), jnp.asarray(scale),
                   jnp.asarray(shift), dilation=dilation, interpret=True)
    want = bconv3x3_reference(jnp.asarray(x), jnp.asarray(k),
                              jnp.asarray(scale), jnp.asarray(shift),
                              dilation=dilation)
    assert got.shape == want.shape == (n, h, w, co)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.02)


def test_no_relu_and_defaults():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 16, 128).astype(np.float32)
    k = (rng.randn(3, 3, 128, 128) * 0.05).astype(np.float32)
    got = bconv3x3(jnp.asarray(x), jnp.asarray(k), relu=False,
                   interpret=True)
    want = bconv3x3_reference(jnp.asarray(x), jnp.asarray(k), relu=False)
    assert (np.asarray(got, np.float32) < 0).any()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.02)
