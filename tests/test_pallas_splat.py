"""Pallas sampling-transform kernels vs the einsum implementation.

Runs the kernels in TPU interpret mode on the CPU test mesh; the two
implementations must agree (they compute the same function from the
same index fields) and gradients must flow through the custom-VJP
wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

pytestmark = pytest.mark.slow      # interpret-mode kernels, ~60 s

from omnihd_scenes_tpu.ops.lss_project import lss_sample_bev

from tests.test_lss_project import (BEV_START, BEV_VOXEL, D0, DD, FH, FW,
                                    H, NDEPTH, NX, NY, NZ, ROTS, SOLVE_X,
                                    TRANS, W, C)

KW = dict(image_size=(H, W), depth_range=(D0, D0 + DD * NDEPTH, DD),
          bev_start=BEV_START, bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ),
          solve_x=SOLVE_X)


@pytest.fixture(scope='module')
def rand_inputs():
    rng = np.random.RandomState(11)
    depth = jax.nn.softmax(
        jnp.asarray(rng.randn(6, FH, FW, NDEPTH).astype(np.float32)),
        axis=-1)
    feat = jnp.asarray(rng.randn(6, FH, FW, C).astype(np.float32))
    return depth, feat


def test_pallas_matches_einsum(rand_inputs):
    depth, feat = rand_inputs
    want = np.asarray(lss_sample_bev(depth, feat, jnp.asarray(ROTS),
                                     jnp.asarray(TRANS), impl='einsum',
                                     **KW))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(lss_sample_bev(depth, feat, jnp.asarray(ROTS),
                                        jnp.asarray(TRANS), impl='pallas',
                                        **KW))
    assert want.any()
    # bf16 kernel dots vs f32 CPU einsums: tolerance ~1e-2 relative.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # Structure must match exactly: same nonzero support.
    assert ((np.abs(got) > 1e-4) == (np.abs(want) > 1e-4)).mean() > 0.999


def test_pallas_gradients_match_einsum(rand_inputs):
    depth, feat = rand_inputs

    def loss(impl, d, f):
        out = lss_sample_bev(d, f, jnp.asarray(ROTS), jnp.asarray(TRANS),
                             impl=impl, **KW)
        return jnp.sum(out ** 2)

    gd_ref, gf_ref = jax.grad(lambda d, f: loss('einsum', d, f),
                              argnums=(0, 1))(depth, feat)
    with pltpu.force_tpu_interpret_mode():
        gd, gf = jax.grad(lambda d, f: loss('pallas', d, f),
                          argnums=(0, 1))(depth, feat)
    # The custom-VJP backward IS the einsum VJP; only the forward
    # residual (out ** 2 cotangent) differs by bf16 rounding.
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               rtol=5e-2, atol=5e-2)


def test_pallas_windows_match_einsum(rand_inputs):
    """Windowed pallas path (per-(solve_x, window) grouping) vs the
    windowed einsum path."""
    depth, feat = rand_inputs
    # Mixed artificial windows: aligned subsets covering all valid
    # cells is NOT required for this equality (both impls use the same
    # windows) — exercise distinct offsets within a group.
    wins = tuple((8, NY - 8) if sx else (0, NX - 8)
                 for sx in SOLVE_X)
    want = np.asarray(lss_sample_bev(depth, feat, jnp.asarray(ROTS),
                                     jnp.asarray(TRANS), impl='einsum',
                                     b_windows=wins, **KW))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(lss_sample_bev(depth, feat, jnp.asarray(ROTS),
                                        jnp.asarray(TRANS),
                                        impl='pallas', b_windows=wins,
                                        **KW))
    assert want.any()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pallas_invalid_depth_bin_guard(rand_inputs):
    """depth_range with dd < d0 produces kd_star = -1 cells (depth in
    (d_floor, d0)); the kernel's lane select must treat them as zero
    weight exactly like the einsum path (regression: lane c_f-1 has
    lane_d == -1 and used to match)."""
    depth, _ = rand_inputs
    # c_ch must be a multiple of 64 so lane c_f-1 is a REAL feature
    # channel (with pad channels the bad select reads zeros anyway).
    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.randn(6, FH, FW, 64).astype(np.float32))
    kw = dict(KW)
    kw['depth_range'] = (2.0, 8.0, 0.5)      # d_floor=1.0 < d0=2.0
    want = np.asarray(lss_sample_bev(depth[..., :12], feat,
                                     jnp.asarray(ROTS),
                                     jnp.asarray(TRANS), impl='einsum',
                                     **kw))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(lss_sample_bev(depth[..., :12], feat,
                                        jnp.asarray(ROTS),
                                        jnp.asarray(TRANS),
                                        impl='pallas', **kw))
    assert want.any()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
