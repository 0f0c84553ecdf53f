"""Deformable attention op: grid_sample parity + algebraic checks."""

import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.ops.ms_deform_attn import (bilinear_sample,
                                                  multi_scale_deformable_attn)


class TestBilinearSample:
    def test_exact_at_centers(self):
        rng = np.random.RandomState(0)
        v = jnp.asarray(rng.randn(4, 5, 3).astype(np.float32))
        # Sampling exactly at texel centers returns the texel.
        locs = jnp.array([[0.0, 0.0], [2.0, 1.0], [4.0, 3.0]])
        out = bilinear_sample(v, locs)
        assert np.allclose(out[0], v[0, 0], atol=1e-6)
        assert np.allclose(out[1], v[1, 2], atol=1e-6)
        assert np.allclose(out[2], v[3, 4], atol=1e-6)

    def test_midpoint_interpolation(self):
        v = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0).at[1, 1, 0].set(3.0)
        out = bilinear_sample(v, jnp.array([[0.5, 0.5]]))
        # Average of the four corners: (1 + 0 + 0 + 3)/4.
        assert np.isclose(float(out[0, 0]), 1.0)

    def test_out_of_bounds_zero(self):
        v = jnp.ones((3, 3, 1))
        out = bilinear_sample(v, jnp.array([[-2.0, 0.0], [5.0, 5.0]]))
        assert np.allclose(out, 0.0)

    def test_border_partial(self):
        v = jnp.ones((3, 3, 1))
        # Half outside: only two in-bounds taps with weight 0.25 each...
        out = bilinear_sample(v, jnp.array([[-0.5, 1.0]]))
        assert np.isclose(float(out[0, 0]), 0.5)


class TestMSDeformAttn:
    def test_weighted_sum_semantics(self):
        """One level, weights concentrated on one point -> pure sample."""
        rng = np.random.RandomState(1)
        h, w, nh, d = 4, 6, 2, 8
        value = jnp.asarray(rng.randn(h * w, nh, d).astype(np.float32))
        nq, npts = 3, 2
        locs = jnp.asarray(rng.uniform(0.2, 0.8, (nq, nh, 1, npts, 2))
                           .astype(np.float32))
        weights = jnp.zeros((nq, nh, 1, npts)).at[:, :, :, 0].set(1.0)

        out = multi_scale_deformable_attn(value, ((h, w),), locs, weights)
        assert out.shape == (nq, nh * d)

        # Manual single-point sample.
        vmap = np.asarray(value).reshape(h, w, nh, d)
        for q in range(nq):
            for hd in range(nh):
                x = float(locs[q, hd, 0, 0, 0]) * w - 0.5
                y = float(locs[q, hd, 0, 0, 1]) * h - 0.5
                ref = np.asarray(bilinear_sample(
                    jnp.asarray(vmap[:, :, hd]), jnp.array([[x, y]])))[0]
                assert np.allclose(out[q, hd * d:(hd + 1) * d], ref,
                                   atol=1e-5)

    def test_multi_level_sums(self):
        rng = np.random.RandomState(2)
        shapes = ((4, 4), (2, 2))
        total = sum(h * w for h, w in shapes)
        value = jnp.asarray(rng.randn(total, 1, 4).astype(np.float32))
        locs = jnp.full((2, 1, 2, 1, 2), 0.5)
        weights = jnp.full((2, 1, 2, 1), 0.5)
        out = multi_scale_deformable_attn(value, shapes, locs, weights)
        assert out.shape == (2, 4)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_gradients_flow(self):
        rng = np.random.RandomState(3)
        value = jnp.asarray(rng.randn(16, 1, 4).astype(np.float32))
        locs = jnp.asarray(rng.uniform(0.3, 0.7, (2, 1, 1, 2, 2))
                           .astype(np.float32))
        weights = jnp.full((2, 1, 1, 2), 0.5)

        g_v, g_l = jax.grad(
            lambda v, l: jnp.sum(multi_scale_deformable_attn(
                v, ((4, 4),), l, weights) ** 2), argnums=(0, 1))(value, locs)
        assert float(jnp.abs(g_v).sum()) > 0
        assert float(jnp.abs(g_l).sum()) > 0  # grads through locations


def test_query_chunking_matches_unchunked():
    import numpy as np

    rng = np.random.RandomState(9)
    h, w, nh, d = 6, 8, 2, 4
    nq, nl, npt = 50, 1, 3
    value = jnp.asarray(rng.randn(h * w, nh, d).astype(np.float32))
    loc = jnp.asarray(rng.rand(nq, nh, nl, npt, 2).astype(np.float32))
    wgt = jnp.asarray(rng.rand(nq, nh, nl, npt).astype(np.float32))
    full = multi_scale_deformable_attn(value, [(h, w)], loc, wgt,
                                       query_chunk=nq + 1)
    chunked = multi_scale_deformable_attn(value, [(h, w)], loc, wgt,
                                          query_chunk=16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    # gradients flow through the chunked path too
    g = jax.grad(lambda v: jnp.sum(multi_scale_deformable_attn(
        v, [(h, w)], loc, wgt, query_chunk=16) ** 2))(value)
    assert float(jnp.abs(g).sum()) > 0


class TestOnehotDual:
    """One-hot matmul dual of the small-table single-level attention
    (the SCA production path) vs the patch-gather reference."""

    def _case(self, nq, shapes, nh=8, d=32, npts=8, seed=0):
        import numpy as np

        from omnihd_scenes_tpu.ops.ms_deform_attn import (
            multi_scale_deformable_attn)
        rng = np.random.RandomState(seed)
        nk = sum(h * w for h, w in shapes)
        value = rng.randn(nk, nh, d).astype(np.float32)
        loc = rng.uniform(-0.2, 1.2,
                          (nq, nh, len(shapes), npts, 2)).astype(
                              np.float32)
        w = rng.rand(nq, nh, len(shapes), npts).astype(np.float32)
        w /= w.sum(axis=(-2, -1), keepdims=True)
        want = np.asarray(multi_scale_deformable_attn(
            value, shapes, loc, w, impl='gather'))
        got = np.asarray(multi_scale_deformable_attn(
            value, shapes, loc, w, impl='onehot'))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_matches_gather_small_table(self):
        self._case(257, ((17, 30),))

    def test_matches_gather_tiny_table(self):
        self._case(37, ((2, 3),), nh=4, d=8, npts=4)

    def test_chunked_matches(self):
        import numpy as np

        from omnihd_scenes_tpu.ops.ms_deform_attn import (
            multi_scale_deformable_attn)
        rng = np.random.RandomState(3)
        value = rng.randn(510, 8, 32).astype(np.float32)
        loc = rng.uniform(0, 1, (1000, 8, 1, 8, 2)).astype(np.float32)
        w = rng.rand(1000, 8, 1, 8).astype(np.float32)
        full = np.asarray(multi_scale_deformable_attn(
            value, ((17, 30),), loc, w, impl='onehot'))
        chunked = np.asarray(multi_scale_deformable_attn(
            value, ((17, 30),), loc, w, impl='onehot', query_chunk=128))
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)

    def test_gradients_match_gather(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from omnihd_scenes_tpu.ops.ms_deform_attn import (
            multi_scale_deformable_attn)
        rng = np.random.RandomState(7)
        value = rng.randn(24, 4, 8).astype(np.float32)
        loc = rng.uniform(0.05, 0.95, (19, 4, 1, 4, 2)).astype(np.float32)
        w = rng.rand(19, 4, 1, 4).astype(np.float32)

        def loss(impl, v, l, ww):
            out = multi_scale_deformable_attn(v, ((4, 6),), l, ww,
                                              impl=impl)
            return jnp.sum(out ** 2)

        for arg in range(3):
            g_ref = jax.grad(lambda *a: loss('gather', *a), arg)(
                jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
            g_new = jax.grad(lambda *a: loss('onehot', *a), arg)(
                jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
            np.testing.assert_allclose(np.asarray(g_new),
                                       np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-4)


class TestWindowedDual:
    """Tile-local one-hot dual for grid-ordered queries (the TSA
    production path) vs the patch-gather reference.

    Lossless condition: every tap's support within ``radius - 1`` cells
    of its query's own cell (``tsa_window_overflow_fraction`` == 0);
    taps beyond the window contribute zero by design.
    """

    def _grid_refs(self, h, w):
        import numpy as np
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gx, gy = np.meshgrid(xs, ys)
        return np.stack([gx.ravel(), gy.ravel()], -1)  # (h*w, 2) in [0,1]

    def _case(self, h, w, tile, radius, off_cells, nh=4, d=8, npts=4,
              seed=0, expect_equal=True):
        import numpy as np

        from omnihd_scenes_tpu.ops.ms_deform_attn import (
            msda_windowed_bev, multi_scale_deformable_attn,
            tsa_window_overflow_fraction)
        rng = np.random.RandomState(seed)
        value = rng.randn(h * w, nh, d).astype(np.float32)
        refs = self._grid_refs(h, w)[:, None, None, None, :]
        off = rng.uniform(-off_cells, off_cells,
                          (h * w, nh, 1, npts, 2)).astype(np.float32)
        loc = (refs + off / np.asarray([w, h])).astype(np.float32)
        wgt = rng.rand(h * w, nh, 1, npts).astype(np.float32)
        wgt /= wgt.sum(axis=(-2, -1), keepdims=True)
        want = np.asarray(multi_scale_deformable_attn(
            value, ((h, w),), loc, wgt, impl='gather'))
        got = np.asarray(msda_windowed_bev(
            value, ((h, w),), loc, wgt, tile=tile, radius=radius,
            tile_chunk=3))
        overflow = float(tsa_window_overflow_fraction(
            loc, ((h, w),), radius=radius))
        if expect_equal:
            assert overflow == 0.0, overflow
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        else:
            assert overflow > 0.0
            # Windowed zeroes the out-of-window taps -> must differ.
            assert np.abs(got - want).max() > 1e-4

    def test_matches_gather_within_radius(self):
        self._case(16, 24, tile=8, radius=4, off_cells=2.5)

    def test_matches_gather_edge_samples(self):
        # Offsets pushing supports off the TABLE edge: both paths give
        # zero for OOB taps.
        self._case(8, 16, tile=8, radius=4, off_cells=2.9, seed=3)

    def test_production_geometry(self):
        # 160x240 is divisible by tile 16; run a downscaled replica
        # with the production tile/radius ratio.
        self._case(32, 48, tile=16, radius=8, off_cells=6.0, seed=1)

    def test_overflow_taps_zeroed(self):
        self._case(16, 24, tile=8, radius=4, off_cells=9.0, seed=2,
                   expect_equal=False)

    def test_gradients_match_gather(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from omnihd_scenes_tpu.ops.ms_deform_attn import (
            msda_windowed_bev, multi_scale_deformable_attn)
        rng = np.random.RandomState(5)
        h, w, nh, d, npts = 8, 16, 4, 8, 4
        value = rng.randn(h * w, nh, d).astype(np.float32)
        refs = self._grid_refs(h, w)[:, None, None, None, :]
        off = rng.uniform(-2, 2, (h * w, nh, 1, npts, 2))
        loc = (refs + off / np.asarray([w, h])).astype(np.float32)
        wgt = rng.rand(h * w, nh, 1, npts).astype(np.float32)

        def loss(fn, v, l, ww):
            return jnp.sum(fn(v, ((h, w),), l, ww) ** 2)

        gather = lambda v, s, l, ww: multi_scale_deformable_attn(
            v, s, l, ww, impl='gather')
        windowed = lambda v, s, l, ww: msda_windowed_bev(
            v, s, l, ww, tile=8, radius=4, tile_chunk=2)
        for arg in range(3):
            g_ref = jax.grad(
                lambda *a: loss(gather, *a), arg)(
                jnp.asarray(value), jnp.asarray(loc), jnp.asarray(wgt))
            g_new = jax.grad(
                lambda *a: loss(windowed, *a), arg)(
                jnp.asarray(value), jnp.asarray(loc), jnp.asarray(wgt))
            np.testing.assert_allclose(np.asarray(g_new),
                                       np.asarray(g_ref),
                                       rtol=5e-4, atol=5e-4)
