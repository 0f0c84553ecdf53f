"""Phase-decomposed integer bilinear upsampling == jax.image.resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.ops.resize import resize_bilinear, upsample_bilinear_int


@pytest.mark.parametrize('f', [2, 4, 8])
@pytest.mark.parametrize('hw', [(17, 30), (8, 8), (5, 7)])
def test_matches_jax_image_resize(f, hw):
    rng = np.random.RandomState(f * 100 + hw[0])
    x = rng.randn(2, *hw, 6).astype(np.float32)
    want = jax.image.resize(
        x, (2, hw[0] * f, hw[1] * f, 6), method='bilinear')
    got = upsample_bilinear_int(jnp.asarray(x), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_resize_dispatch():
    x = np.random.RandomState(0).randn(1, 17, 30, 4).astype(np.float32)
    got = resize_bilinear(jnp.asarray(x), (136, 240))   # 8x fast path
    want = jax.image.resize(x, (1, 136, 240, 4), method='bilinear')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # Non-integral fallback still works.
    got2 = resize_bilinear(jnp.asarray(x), (20, 33))
    assert got2.shape == (1, 20, 33, 4)
    # Identity short-circuit.
    assert resize_bilinear(jnp.asarray(x), (17, 30)) is not None


def test_extra_leading_dims():
    x = np.random.RandomState(1).randn(2, 3, 9, 11, 5).astype(np.float32)
    got = upsample_bilinear_int(jnp.asarray(x), 2)
    want = jax.image.resize(x, (2, 3, 18, 22, 5), method='bilinear')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
