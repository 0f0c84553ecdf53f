"""Space-to-depth folded ResNet stem: exactness + tree compatibility.

The serving-side stem optimization (models/resnet.py:_S2DStem) claims
EXACT equality with the standard 7x7/s2/p3 stem — the MLPerf folding is
an identity rewrite, not an approximation — and an unchanged parameter
tree (checkpoints / torch-import oblivious).  Both claims are pinned
here on the virtual CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.resnet import (ResNet, space_to_depth,
                                             space_to_depth_np)


@pytest.fixture(scope='module')
def img():
    return np.random.RandomState(0).randn(2, 64, 96, 3).astype(np.float32)


def test_space_to_depth_packing(img):
    """jnp and np packers agree, and the layout is (qy, qx, c)."""
    a = np.asarray(space_to_depth(jnp.asarray(img)))
    b = space_to_depth_np(img)
    np.testing.assert_array_equal(a, b)
    # Phase (qy=1, qx=0), channel 2 of pixel block (i, j) comes from
    # the raw pixel (2i+1, 2j, 2).
    i, j = 5, 7
    assert a[0, i, j, 1 * 2 * 3 + 0 * 3 + 2] == img[0, 2 * i + 1, 2 * j, 2]


def test_stem_s2d_exact_and_tree_compatible(img):
    """Same params, packed input -> identical backbone outputs."""
    ref = ResNet(depth=18, out_indices=(0, 1), frozen_bn=True)
    s2d = ResNet(depth=18, out_indices=(0, 1), frozen_bn=True,
                 stem_s2d=True)
    x = jnp.asarray(img)
    xp = space_to_depth(x)

    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    # Identical param trees (paths AND shapes) — the s2d stem stores
    # the ORIGINAL (7,7,3,64) kernel under the same Conv_0 path.
    variables2 = s2d.init(jax.random.PRNGKey(0), xp, train=False)
    t1 = jax.tree_util.tree_map(lambda v: v.shape, variables)
    t2 = jax.tree_util.tree_map(lambda v: v.shape, variables2)
    assert t1 == t2

    want = ref.apply(variables, x, train=False)
    got = s2d.apply(variables, xp, train=False)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        assert w.shape == g.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_stem_s2d_odd_phase_content(img):
    """The folded stem is exact even when image content is wildly
    asymmetric across the 2x2 phases (catches phase-order mixups that
    random-noise inputs can average away)."""
    x = np.zeros_like(img)
    x[:, ::2, ::2] = 5.0
    x[:, 1::2, ::2] = -3.0
    x[:, :, 1::2] += np.arange(x.shape[-2] // 2).reshape(1, 1, -1, 1)
    ref = ResNet(depth=18, out_indices=(0,), frozen_bn=True)
    s2d = ResNet(depth=18, out_indices=(0,), frozen_bn=True,
                 stem_s2d=True)
    xj = jnp.asarray(x)
    variables = ref.init(jax.random.PRNGKey(1), xj, train=False)
    want = ref.apply(variables, xj, train=False)[0]
    got = s2d.apply(variables, space_to_depth(xj), train=False)[0]
    # Identity rewrite in exact arithmetic; f32 reassociation of the
    # stem contraction leaves ~1e-5 noise after two ResNet stages.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bevfusion_stem_s2d_wiring():
    """BEVFusionConfig(stem_s2d=True) accepts packed imgs and matches
    the unpacked model with shared params (camera stream only, tiny)."""
    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)
    from omnihd_scenes_tpu.models.lss import LSSConfig

    lss = LSSConfig(final_dim=(64, 96), camera_depth_range=(1.0, 9.0, 2.0),
                    pc_range=(-12, -8, -1, 12, 8, 1), grid=0.5,
                    num_views=2, camC=32,
                    cam_solve_x=(True, False))
    base = dict(radar_stream=False, lc_fusion=False, se=False,
                use_depthnet=False, num_views=2, imc=32, lss=lss,
                resnet_depth=18)
    ref = BEVFusion(BEVFusionConfig(**base))
    s2d = BEVFusion(BEVFusionConfig(stem_s2d=True, **base))

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(1, 2, 64, 96, 3).astype(np.float32))
    rots = jnp.asarray(np.tile(np.eye(3, dtype=np.float32) * 0.05,
                               (1, 2, 1, 1)))
    trans = jnp.asarray(np.zeros((1, 2, 3), np.float32))
    packed = space_to_depth(imgs)

    variables = ref.init(jax.random.PRNGKey(0), imgs=imgs, rots=rots,
                         trans=trans, train=False)
    want = ref.apply(variables, imgs=imgs, rots=rots, trans=trans,
                     train=False)
    got = s2d.apply(variables, imgs=packed, rots=rots, trans=trans,
                    train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        want, got)


def test_stem_s2d_calib_quant_tree_interchangeable(img):
    """Calibrating with stem_s2d=True must produce the SAME 'quant'
    variable tree as the standard stem (ADVICE r4): space_to_depth only
    rearranges pixels, so the stem act_amax is bit-equal, and a calib
    checkpoint taken in either mode deploys in the other."""
    from omnihd_scenes_tpu.models import quant

    ref = ResNet(depth=18, out_indices=(0,), frozen_bn=True)
    s2d = ResNet(depth=18, out_indices=(0,), frozen_bn=True,
                 stem_s2d=True)
    x = jnp.asarray(img)
    xp = space_to_depth(x)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)

    quant.set_mode('calib')
    try:
        _, mut1 = ref.apply(variables, x, train=False, mutable=['quant'])
        _, mut2 = s2d.apply(variables, xp, train=False, mutable=['quant'])
    finally:
        quant.set_mode('off')

    p1 = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
          jax.tree_util.tree_flatten_with_path(mut1['quant'])[0]}
    p2 = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
          jax.tree_util.tree_flatten_with_path(mut2['quant'])[0]}
    assert p1.keys() == p2.keys()
    for k in p1:
        np.testing.assert_allclose(p2[k], p1[k], rtol=1e-6,
                                   err_msg=k)

    # And the s2d calib checkpoint actually deploys on the standard
    # stem in int8 mode (this direction used to KeyError).
    quant.set_mode('int8')
    try:
        y = ref.apply({**variables, 'quant': mut2['quant']}, x,
                      train=False)
    finally:
        quant.set_mode('off')
    assert np.isfinite(np.asarray(y[0])).all()
