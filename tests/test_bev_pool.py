"""bev_pool_v2 parity test mirroring the reference kernel self-test
(``ops/bev_pool_v2/bev_pool.py:145-176``: loss == 4.4 and hand-computed
depth/feat gradients), plus splat/frustum unit checks."""

import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.ops.bev_pool import (bev_pool_v2, frustum_voxel_ids,
                                            lss_splat)


def test_bev_pool_v2_reference_parity():
    depth = jnp.asarray(
        np.array([0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9],
                 np.float32).reshape(1, 1, 2, 2, 2))
    feat = jnp.ones((1, 1, 2, 2, 2), jnp.float32)
    ranks_depth = jnp.array([0, 4, 1, 6], jnp.int32)
    ranks_feat = jnp.array([0, 0, 1, 2], jnp.int32)
    ranks_bev = jnp.array([0, 0, 1, 1], jnp.int32)

    def loss_fn(depth, feat):
        out = bev_pool_v2(depth, feat, ranks_depth, ranks_feat, ranks_bev,
                          (1, 1, 2, 2, 2))
        return jnp.sum(out)

    loss, (g_depth, g_feat) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        depth, feat)

    assert np.isclose(float(loss), 4.4), float(loss)
    expected_g_depth = np.array([2., 2., 0., 0., 2., 0., 2., 0.],
                                np.float32).reshape(1, 1, 2, 2, 2)
    expected_g_feat = np.array([1.0, 1.0, 0.4, 0.4, 0.8, 0.8, 0., 0.],
                               np.float32).reshape(1, 1, 2, 2, 2)
    assert np.allclose(np.asarray(g_depth), expected_g_depth)
    assert np.allclose(np.asarray(g_feat), expected_g_feat)


def test_lss_splat_matches_dense_scatter():
    rng = np.random.RandomState(0)
    n, d, h, w, c = 2, 5, 4, 6, 3
    n_cells = 50
    depth = jax.nn.softmax(jnp.asarray(rng.randn(n, d, h, w)), axis=1)
    feat = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, n_cells + 10, (n, d, h, w)),
                      dtype=jnp.int32)  # some out of range

    out = lss_splat(depth, feat, ids, n_cells, chunk_d=2)

    # Dense reference.
    ref = np.zeros((n_cells, c), np.float32)
    dn, fn, idn = (np.asarray(depth), np.asarray(feat), np.asarray(ids))
    for ni in range(n):
        for di in range(d):
            for hi in range(h):
                for wi in range(w):
                    cell = idn[ni, di, hi, wi]
                    if cell < n_cells:
                        ref[cell] += dn[ni, di, hi, wi] * fn[ni, hi, wi]
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_lss_splat_grads_flow():
    rng = np.random.RandomState(1)
    n, d, h, w, c = 1, 4, 3, 3, 2
    depth = jnp.asarray(rng.rand(n, d, h, w).astype(np.float32))
    feat = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 20, (n, d, h, w)), dtype=jnp.int32)

    g_depth, g_feat = jax.grad(
        lambda dp, ft: jnp.sum(lss_splat(dp, ft, ids, 20) ** 2),
        argnums=(0, 1))(depth, feat)
    assert np.all(np.isfinite(np.asarray(g_depth)))
    assert np.all(np.isfinite(np.asarray(g_feat)))
    assert float(jnp.abs(g_depth).sum()) > 0


def test_frustum_voxel_ids_projection():
    # Camera at origin looking down +x (identity img->lidar after
    # intrinsics folding): frustum points (u*d, v*d, d) land at known
    # voxels.
    d_vals = jnp.array([1.0, 2.0])
    frustum = jnp.zeros((2, 1, 1, 3))
    frustum = frustum.at[:, 0, 0, 2].set(d_vals)  # u=v=0
    rots = jnp.eye(3)[None]
    trans = jnp.zeros((1, 3))
    ids = frustum_voxel_ids(frustum, rots, trans,
                            bev_start=(0.0, -5.0, -5.0),
                            bev_voxel=(1.0, 1.0, 10.0),
                            bev_nx=(10, 10, 1))
    # point (0, 0, depth): x=0? No: pts = (u*d, v*d, d) = (0, 0, d) ->
    # cx = floor((0-0)/1)=0, cy = floor((0+5)/1)=5, cz = floor((d+5)/10)=0.
    assert ids.shape == (1, 2, 1, 1)
    assert int(ids[0, 0, 0, 0]) == 5 * 10 + 0
    assert int(ids[0, 1, 0, 0]) == 5 * 10 + 0
