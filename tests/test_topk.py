"""blocked_top_k must be bit-identical to lax.top_k, ties included."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.ops.topk import blocked_top_k


def _check(x, k, nb=16):
    v_ref, i_ref = jax.lax.top_k(x, min(k, x.shape[-1]))
    v, i = blocked_top_k(x, k, num_blocks=nb)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_random_f32():
    x = jnp.asarray(np.random.RandomState(0).rand(307200).astype(np.float32))
    _check(x, 1000)


def test_random_bf16_has_ties():
    # bf16's 8-bit mantissa makes ties common at 307k samples of U[0,1).
    x = jnp.asarray(np.random.RandomState(1).rand(307200), dtype=jnp.bfloat16)
    _check(x, 1000)


def test_all_equal_ties_across_blocks():
    _check(jnp.ones(32000, jnp.float32), 1000, nb=16)


def test_tie_group_spanning_blocks():
    x = np.zeros(32000, np.float32)
    x[1500:2500] = 7.0          # one tie group straddling a block edge
    x[10] = 9.0
    _check(jnp.asarray(x), 600, nb=16)


@pytest.mark.parametrize('n,k,nb', [
    (1000, 1000, 16),     # k == n -> fallback
    (1001, 100, 16),      # n % nb != 0 -> fallback
    (3000, 100, 16),      # nb*k*2 >= n -> fallback
    (50, 100, 16),        # k > n -> clamps like lax.top_k
])
def test_fallback_paths(n, k, nb):
    x = jnp.asarray(np.random.RandomState(2).rand(n).astype(np.float32))
    _check(x, k, nb)


def test_rejects_2d():
    with pytest.raises(ValueError):
        blocked_top_k(jnp.zeros((4, 100)), 10)
