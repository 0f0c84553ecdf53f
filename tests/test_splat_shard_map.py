"""shard_map wrapper for the splat region (VERDICT r4 #5).

pallas_call does not compose with GSPMD auto-partitioning, so
``LSSConfig.splat_shard_axis`` runs the (param-free) per-sample splat
loop explicitly per data shard via ``jax.shard_map``.  These tests pin
that the wrapper is a numerical no-op: the sharded result equals the
unsharded one on the virtual 8-CPU mesh — with the einsum backend in
the quick tier and the production Pallas kernels (interpret mode) in
the opt-in slow tier.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.lss import LiftSplatShoot, LSSConfig
from omnihd_scenes_tpu.parallel.mesh import (make_mesh, set_current_mesh,
                                             shard_batch)

CFG = LSSConfig(final_dim=(64, 112), downsample=8,
                camera_depth_range=(2.0, 14.0, 2.0),
                pc_range=(-24, -16, -3.0, 24, 16, 5.0), grid=2.0,
                inputC=16, camC=8, outC=16, splat_impl='einsum')
B, N = 8, 6


@pytest.fixture(scope='module')
def inputs():
    rng = np.random.RandomState(3)
    fh, fw = CFG.feat_hw
    feat = rng.randn(B, N, fh, fw, CFG.inputC).astype(np.float32)
    yaws = np.arange(N) * np.pi / 3
    rots, trans = [], []
    for y in yaws:
        c, s = np.cos(y), np.sin(y)
        ry = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        kinv = np.array([[1 / 30.0, 0, -112 / 60.0],
                         [0, 1 / 30.0, -64 / 60.0],
                         [0, 0, 1.0]], np.float32)
        flip = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
        rots.append(ry @ flip @ kinv)
        trans.append(ry @ np.array([1.0, 0, 0.5], np.float32))
    rots = np.tile(np.stack(rots)[None], (B, 1, 1, 1)).astype(np.float32)
    trans = np.tile(np.stack(trans)[None], (B, 1, 1)).astype(np.float32)
    return feat, rots, trans


def _run(cfg, variables, feat, rots, trans, mesh=None):
    model = LiftSplatShoot(cfg, use_depthnet=False)
    fn = jax.jit(lambda v, *a: model.apply(v, *a, False))
    if mesh is None:
        return np.asarray(fn(variables, feat, rots, trans)[0])
    with mesh:
        batch = shard_batch({'f': feat, 'r': rots, 't': trans}, mesh)
        out = fn(variables, batch['f'], batch['r'], batch['t'])[0]
    return np.asarray(out)


def test_shard_map_splat_is_a_numerical_noop(inputs):
    feat, rots, trans = inputs
    mesh = make_mesh(('data',))
    plain = LiftSplatShoot(CFG, use_depthnet=False)
    variables = plain.init(jax.random.PRNGKey(0), feat, rots, trans, False)

    want = _run(CFG, variables, feat, rots, trans)

    cfg_sm = dataclasses.replace(CFG, splat_shard_axis='data')
    set_current_mesh(mesh)
    try:
        # Param tree is unaffected by the wrapper (same variables).
        got = _run(cfg_sm, variables, feat, rots, trans, mesh=mesh)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shard_axis_without_mesh_fails_loudly(inputs):
    feat, rots, trans = inputs
    cfg_sm = dataclasses.replace(CFG, splat_shard_axis='data')
    model = LiftSplatShoot(cfg_sm, use_depthnet=False)
    with pytest.raises(RuntimeError, match='set_current_mesh'):
        model.init(jax.random.PRNGKey(0), feat, rots, trans, False)


@pytest.mark.slow
def test_shard_map_pallas_matches_einsum(inputs):
    from jax.experimental.pallas import tpu as pltpu

    feat, rots, trans = inputs
    # 2-device mesh / batch 2: interpret mode executes shards
    # sequentially on the single CPU core, so keep the kernel count low.
    mesh = make_mesh(('data',), devices=jax.devices()[:2])
    feat, rots, trans = feat[:2], rots[:2], trans[:2]
    plain = LiftSplatShoot(CFG, use_depthnet=False)
    variables = plain.init(jax.random.PRNGKey(0), feat, rots, trans, False)
    want = _run(CFG, variables, feat, rots, trans)

    cfg_p = dataclasses.replace(CFG, splat_impl='pallas',
                                splat_shard_axis='data')
    set_current_mesh(mesh)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = _run(cfg_p, variables, feat, rots, trans, mesh=mesh)
    finally:
        set_current_mesh(None)
    # bf16 kernel dots vs f32 einsum (the BevEncoderConvs after the
    # splat amplify slightly): structure-level agreement.
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
