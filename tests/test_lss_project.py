"""Tests for the one-hot-matmul sampling view transform
(:mod:`omnihd_scenes_tpu.ops.lss_project`).

Covers, on a realistic 6-camera rig:
  1. exact agreement with a NumPy mirror of the pass-decomposed
     sampling semantics (verifies all index algebra / one-hots /
     transposes / per-camera cond wiring);
  2. semantic agreement with the exact scatter splat
     (:mod:`omnihd_scenes_tpu.ops.bev_pool`) on isolated points;
  3. gradient flow to feat and depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.ops.bev_pool import frustum_voxel_ids, lss_splat
from omnihd_scenes_tpu.ops.lss_project import lss_sample_bev

H, W = 64, 112
FH, FW = 16, 28
D0, DD, NDEPTH = 2.0, 2.0, 12           # bins at 2, 4, ..., 24 m
BEV_START = (-30.0, -20.0, -3.0)
BEV_VOXEL = (1.25, 1.25, 2.0)
NX, NY, NZ = 48, 32, 4
C = 5


def make_rig():
    """6 cameras: yaw 0/60/120/180/240/300 deg, 5 deg pitch down,
    mounted 1.8 m up, pushed 1 m out along the viewing direction."""
    f = 60.0
    k_mat = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    k_inv = np.linalg.inv(k_mat)
    rots, trans, solve_x = [], [], []
    for yaw_deg in (0, 60, 120, 180, 240, 300):
        yaw = np.deg2rad(yaw_deg)
        view = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.array([np.sin(yaw), -np.cos(yaw), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        pitch = np.deg2rad(5.0)                      # tilt view down
        view_p = view * np.cos(pitch) - np.array([0, 0, 1]) * np.sin(pitch)
        down_p = down * np.cos(pitch) + view * np.sin(pitch)
        r_c2l = np.stack([right, down_p, view_p], axis=1)
        rots.append(r_c2l @ k_inv)
        trans.append(view * 1.0 + np.array([0, 0, 1.8]))
        solve_x.append(abs(view[0]) >= abs(view[1]))
    return (np.stack(rots).astype(np.float32),
            np.stack(trans).astype(np.float32), tuple(solve_x))


ROTS, TRANS, SOLVE_X = make_rig()


def numpy_mirror(depth, feat, rots, trans):
    """Direct NumPy evaluation of the pass-decomposed sampling:
    j* from the full projection, u* re-evaluated on row v_{j*}."""
    n_cams = depth.shape[0]
    c_ch = feat.shape[-1]
    out = np.zeros((NZ, NY, NX, c_ch), np.float64)
    ys = np.linspace(0, H - 1, FH)
    v_scale = (FH - 1) / (H - 1)
    u_scale = (FW - 1) / (W - 1)
    xc = BEV_START[0] + (np.arange(NX) + 0.5) * BEV_VOXEL[0]
    yc = BEV_START[1] + (np.arange(NY) + 0.5) * BEV_VOXEL[1]
    zc = BEV_START[2] + (np.arange(NZ) + 0.5) * BEV_VOXEL[2]
    for n in range(n_cams):
        minv = np.linalg.inv(rots[n].astype(np.float64))
        mt = -minv @ trans[n].astype(np.float64)
        for k in range(NZ):
            for gy in range(NY):
                for gx in range(NX):
                    p = np.array([xc[gx], yc[gy], zc[k]])
                    q = minv @ p + mt
                    d_star = q[2]
                    if d_star <= max(1e-3, D0 * 0.5):
                        continue
                    vs = q[1] / d_star
                    if not (-0.5 < vs < H - 0.5):
                        continue
                    j_star = int(round(vs * v_scale))
                    kd = int(round((d_star - D0) / DD))
                    if not (0 <= kd < NDEPTH):
                        continue
                    # pass-1 algebra: solve the free coord on row v_j*.
                    if SOLVE_X[n]:
                        a_col = minv[:, 0]
                        cc = (minv[:, 1] * yc[gy] + minv[:, 2] * zc[k] + mt)
                    else:
                        a_col = minv[:, 1]
                        cc = (minv[:, 0] * xc[gx] + minv[:, 2] * zc[k] + mt)
                    v_j = ys[j_star]
                    denom = a_col[1] - v_j * a_col[2]
                    if abs(denom) < 1e-6:
                        continue
                    s_star = (v_j * cc[2] - cc[1]) / denom
                    q2s = a_col[2] * s_star + cc[2]
                    if q2s <= max(1e-3, D0 * 0.5):
                        continue
                    us = (a_col[0] * s_star + cc[0]) / q2s
                    if not (-0.5 < us < W - 0.5):
                        continue
                    i_star = int(round(us * u_scale))
                    out[k, gy, gx] += (depth[n, j_star, i_star, kd]
                                       * feat[n, j_star, i_star])
    return out


@pytest.fixture(scope='module')
def rand_inputs():
    rng = np.random.RandomState(7)
    depth = jax.nn.softmax(
        jnp.asarray(rng.randn(6, FH, FW, NDEPTH).astype(np.float32)),
        axis=-1)
    feat = jnp.asarray(rng.randn(6, FH, FW, C).astype(np.float32))
    return np.asarray(depth), np.asarray(feat)


def _run(depth, feat, dtype=jnp.float32):
    return np.asarray(lss_sample_bev(
        jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(ROTS),
        jnp.asarray(TRANS), image_size=(H, W),
        depth_range=(D0, D0 + DD * NDEPTH, DD),
        bev_start=BEV_START, bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ),
        solve_x=SOLVE_X, compute_dtype=dtype))


@pytest.mark.slow
def test_matches_numpy_mirror(rand_inputs):
    depth, feat = rand_inputs
    got = _run(depth, feat)
    want = numpy_mirror(depth.astype(np.float64), feat.astype(np.float64),
                        ROTS, TRANS)
    # Cells can disagree only where a float round sits exactly on a
    # bin boundary; demand near-total exact agreement.
    close = np.isclose(got, want, rtol=1e-4, atol=1e-5)
    frac = close.mean()
    assert frac > 0.999, f'only {frac:.4%} of cells agree'
    assert want.any(), 'degenerate test: mirror produced all zeros'


def test_semantics_vs_exact_splat():
    """Isolated single-pixel features: the sampling dual must place the
    same depth-weighted value in (a neighborhood of) the same cell the
    exact scatter splat uses."""
    depth = np.zeros((6, FH, FW, NDEPTH), np.float32)
    feat = np.zeros((6, FH, FW, C), np.float32)
    probes = [(0, 8, 14, 5), (3, 9, 7, 3), (1, 7, 20, 7)]
    for (n, j, i, kd) in probes:
        depth[n, j, i, kd] = 1.0
        feat[n, j, i] = np.arange(1, C + 1)

    got = _run(depth, feat)

    # Exact splat for comparison.
    frustum = np.zeros((NDEPTH, FH, FW, 3), np.float32)
    frustum[..., 0] = np.linspace(0, W - 1, FW)[None, None, :]
    frustum[..., 1] = np.linspace(0, H - 1, FH)[None, :, None]
    frustum[..., 2] = (D0 + DD * np.arange(NDEPTH))[:, None, None]
    ids = frustum_voxel_ids(jnp.asarray(frustum), jnp.asarray(ROTS),
                            jnp.asarray(TRANS), bev_start=BEV_START,
                            bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ))
    depth_nd = jnp.moveaxis(jnp.asarray(depth), -1, 1)
    exact = np.asarray(lss_splat(depth_nd, jnp.asarray(feat), ids,
                                 NZ * NY * NX)).reshape(NZ, NY, NX, C)

    for (n, j, i, kd) in probes:
        nz_cells = np.argwhere(exact[..., 0] > 0.5)
        # The sampled output must contain the feature value in at least
        # one cell adjacent to each exact-splat cell.
        found = False
        for (k, gy, gx) in nz_cells:
            sl = got[k, max(gy - 1, 0):gy + 2, max(gx - 1, 0):gx + 2, :]
            if np.any(np.isclose(sl[..., 0], 1.0, atol=1e-3)):
                found = True
        assert found, f'probe {(n, j, i, kd)} not recovered near splat cell'


def test_gradients_flow(rand_inputs):
    depth, feat = rand_inputs

    def loss(d, f):
        out = lss_sample_bev(
            d, f, jnp.asarray(ROTS), jnp.asarray(TRANS),
            image_size=(H, W), depth_range=(D0, D0 + DD * NDEPTH, DD),
            bev_start=BEV_START, bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ),
            solve_x=SOLVE_X)
        return jnp.sum(out ** 2)

    gd, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(depth),
                                            jnp.asarray(feat))
    assert np.isfinite(np.asarray(gd)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).sum()) > 0
    assert float(jnp.abs(gd).sum()) > 0


def test_b_windows_conservative_equality(rand_inputs):
    """compute_b_windows windows must leave the output bit-identical
    (out-of-FOV columns contribute nothing) and actually shrink work
    on this 6-camera rig."""
    from omnihd_scenes_tpu.ops.lss_project import compute_b_windows

    depth, feat = rand_inputs
    wins = compute_b_windows(
        ROTS, TRANS, image_size=(H, W), feat_hw=(FH, FW),
        depth_range=(D0, D0 + DD * NDEPTH, DD), bev_start=BEV_START,
        bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ), solve_x=SOLVE_X)
    assert len(wins) == 6
    # NOTE: on this omnidirectional wide-FOV rig the windows stay at
    # (or near) full extent — a camera's FOV wedge cuts the (b, g)
    # product space diagonally, so per-COLUMN validity barely shrinks.
    # Shrinkage is exercised with a narrow-FOV rig below.

    base = _run(depth, feat)
    got = np.asarray(lss_sample_bev(
        jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(ROTS),
        jnp.asarray(TRANS), image_size=(H, W),
        depth_range=(D0, D0 + DD * NDEPTH, DD),
        bev_start=BEV_START, bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ),
        solve_x=SOLVE_X, b_windows=wins, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(got, base)


def test_b_windows_full_extent_noop(rand_inputs):
    depth, feat = rand_inputs
    full = tuple((0, NY if sx else NX) for sx in SOLVE_X)
    got = np.asarray(lss_sample_bev(
        jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(ROTS),
        jnp.asarray(TRANS), image_size=(H, W),
        depth_range=(D0, D0 + DD * NDEPTH, DD),
        bev_start=BEV_START, bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ),
        solve_x=SOLVE_X, b_windows=full, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(got, _run(depth, feat))


@pytest.mark.slow
def test_b_windows_shrink_narrow_fov():
    """A narrow-FOV forward camera sees only a band of y columns; the
    derived window must shrink and the windowed output must stay
    bit-identical."""
    from omnihd_scenes_tpu.ops.lss_project import compute_b_windows

    f = 240.0                                     # ~13 deg half-FOV
    k_mat = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                     np.float64)
    k_inv = np.linalg.inv(k_mat)
    r_c2l = np.stack([[0, 0, 1], [-1, 0, 0], [0, -1, 0]],
                     axis=0).astype(np.float64).T   # look along +x
    rots = (r_c2l @ k_inv)[None].astype(np.float32)
    trans = np.array([[0.0, 0.0, 1.8]], np.float32)
    solve_x = (True,)

    wins = compute_b_windows(
        rots, trans, image_size=(H, W), feat_hw=(FH, FW),
        depth_range=(D0, D0 + DD * NDEPTH, DD), bev_start=BEV_START,
        bev_voxel=BEV_VOXEL, bev_nx=(NX, NY, NZ), solve_x=solve_x)
    assert wins[0][1] < NY, wins                   # proper subset

    rng = np.random.RandomState(11)
    depth = np.asarray(jax.nn.softmax(
        jnp.asarray(rng.randn(1, FH, FW, NDEPTH).astype(np.float32)),
        axis=-1))
    feat = rng.randn(1, FH, FW, C).astype(np.float32)
    kw = dict(image_size=(H, W), depth_range=(D0, D0 + DD * NDEPTH, DD),
              bev_start=BEV_START, bev_voxel=BEV_VOXEL,
              bev_nx=(NX, NY, NZ), solve_x=solve_x,
              compute_dtype=jnp.float32)
    base = np.asarray(lss_sample_bev(
        jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(rots),
        jnp.asarray(trans), **kw))
    got = np.asarray(lss_sample_bev(
        jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(rots),
        jnp.asarray(trans), b_windows=wins, **kw))
    assert base.any()
    np.testing.assert_array_equal(got, base)


def test_sequential_scan_matches_unrolled(rand_inputs):
    """The lax.scan camera-sequential formulation (the training
    backward's memory-bounded path) is the same function as the
    unrolled loop — forward AND gradients."""
    from omnihd_scenes_tpu.ops.lss_project import _Geom, _einsum_all

    depth, feat = rand_inputs
    geom = _Geom((H, W), (FH, FW), (D0, D0 + DD * NDEPTH, DD),
                 BEV_START, BEV_VOXEL, (NX, NY, NZ))
    minv = jnp.linalg.inv(jnp.asarray(ROTS))
    mt = -jnp.einsum('nij,nj->ni', minv, jnp.asarray(TRANS))

    def f(seq):
        def run(d, ft):
            return _einsum_all(d, ft, minv, mt, geom, SOLVE_X, None,
                               jnp.float32, sequential=seq)
        return run

    out_u = f(False)(depth, feat)
    out_s = f(True)(depth, feat)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=1e-5, rtol=1e-5)

    g = np.random.RandomState(3).randn(*out_u.shape).astype(np.float32)

    def loss(run):
        return lambda d, ft: jnp.sum(run(d, ft) * g)

    gd_u, gf_u = jax.grad(loss(f(False)), argnums=(0, 1))(
        jnp.asarray(depth), jnp.asarray(feat))
    gd_s, gf_s = jax.grad(loss(f(True)), argnums=(0, 1))(
        jnp.asarray(depth), jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gd_s), np.asarray(gd_u),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_u),
                               atol=1e-4, rtol=1e-4)
