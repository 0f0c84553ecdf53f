"""Per-component serving-latency profile of the fusion flagship.

Reproduces BENCH.md "The corrected component profile": each component
of the production BEVFusion graph (reference hot path
``cam_stream_lss_bevpoolv2_depthnet.py:152-608`` + the radar pillar
branch) measured IN ISOLATION at the serving batch with the
chained-in-jit harness (``bench.py`` methodology — per-call timing
through the TPU relay measures dispatch, not execution).  Every output
leaf is folded into the loop carry so XLA cannot dead-code-eliminate
unread branches (the round-3 DepthNet 7x under-report).

Usage:
    python -m omnihd_scenes_tpu.tools.profile_components \
        [--batch 4] [--iters 8] [--probe resnet,stem,fpnc,depthnet,\
splat,bevencode,pillar_encode,pillar_encode_fold,scatter_floor,radar,\
decode]

Prints one JSON line per probe: {probe, ms_per_sample, ms_total}.
Caveat from BENCH.md: isolated components sum above the in-graph whole
model (each pays its own input loads; XLA overlaps them in the full
graph), and sub-millisecond probes carry the ~0.6 ms per-iteration
chained-loop cost.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def chained(fn, args, iters, batch):
    """ms/sample of fn chained `iters` times in one jit.

    ``fn(carry, *args) -> scalar`` must fold every output into its
    return value and perturb its inputs by the carry.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(_, c):
            return fn(c, *a).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))                    # compile + warm
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / iters
    return per_iter * 1e3 / batch, per_iter * 1e3


def _live(*outs):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(o.astype(jnp.float32)) * 1e-30
               for o in jax.tree.leaves(outs) if o is not None)


def probe_resnet(b, iters, stem_only=False):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.resnet import ResNet

    x = np.random.RandomState(0).randn(b * 6, 544, 960, 3).astype(
        np.float32)
    model = ResNet(depth=50, out_indices=(1, 2, 3), frozen_bn=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def to_bf16(t):
        return jax.tree.map(lambda v: v.astype(jnp.bfloat16), t)

    variables = jax.device_put(to_bf16(variables))
    xd = jax.device_put(x.astype(jnp.bfloat16))

    if stem_only:
        import flax.linen as nn
        stem = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                       use_bias=False, dtype=jnp.bfloat16)
        sv = jax.device_put(to_bf16(stem.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))))

        def fn(c, xx):
            return _live(stem.apply(sv, xx + c.astype(xx.dtype)))
    else:
        def fn(c, xx):
            return _live(*model.apply(variables, xx + c.astype(xx.dtype),
                                      train=False))
    return chained(fn, (xd,), iters, b)


def probe_fpnc(b, iters):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.fpnc import FPNC

    rng = np.random.RandomState(0)
    stages = [rng.randn(b * 6, 68, 120, 512).astype(np.float32),
              rng.randn(b * 6, 34, 60, 1024).astype(np.float32),
              rng.randn(b * 6, 17, 30, 2048).astype(np.float32)]
    model = FPNC(out_channels=256, outC=256, target_hw=(136, 240))
    variables = model.init(jax.random.PRNGKey(0),
                           [jnp.zeros((1,) + s.shape[1:]) for s in stages],
                           train=False)
    variables = jax.device_put(jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), variables))
    sd = jax.device_put([s.astype(jnp.bfloat16) for s in stages])

    def fn(c, *ss):
        ss = [s + c.astype(s.dtype) for s in ss]
        return _live(model.apply(variables, list(ss), train=False))
    return chained(fn, tuple(sd), iters, b)


def probe_depthnet(b, iters):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.lss import DepthNet

    x = np.random.RandomState(0).randn(b, 6, 136, 240, 256).astype(
        np.float32)
    model = DepthNet(depth_bins=59, cam_channels=64, mid_channels=256)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, 16, 16, 256)), train=False)
    variables = jax.device_put(jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), variables))
    xd = jax.device_put(x.astype(jnp.bfloat16))

    def fn(c, xx):
        return _live(*model.apply(variables, xx + c.astype(xx.dtype),
                                  train=False))
    return chained(fn, (xd,), iters, b)


def probe_splat(b, iters):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.lss import LSSConfig
    from omnihd_scenes_tpu.ops.lss_project import lss_sample_bev

    cfg = LSSConfig()
    rng = np.random.RandomState(0)
    depth = jax.nn.softmax(jnp.asarray(
        rng.randn(b, 6, 136, 240, cfg.depth_bins).astype(np.float32)), -1
        ).astype(jnp.bfloat16)
    feat = jnp.asarray(rng.randn(b, 6, 136, 240, cfg.camC).astype(
        np.float32)).astype(jnp.bfloat16)
    from omnihd_scenes_tpu.utils.rig import ring_rig_img2lidar
    rig_rots, rig_trans = ring_rig_img2lidar(img_hw=cfg.final_dim)
    rots = jnp.asarray(rig_rots)
    trans = jnp.asarray(rig_trans)
    nx, ny, nz = cfg.bev_nx

    def one(d, f):
        return lss_sample_bev(
            d, f, rots, trans, image_size=cfg.final_dim,
            depth_range=cfg.camera_depth_range,
            bev_start=cfg.pc_range[:3], bev_voxel=(cfg.grid,) * 3,
            bev_nx=(nx, ny, nz), solve_x=cfg.cam_solve_x)

    dd, fd = jax.device_put((depth, feat))

    def fn(c, d, f):
        d = d + c.astype(d.dtype)
        f = f + c.astype(f.dtype)
        return _live(*[one(d[i], f[i]) for i in range(b)])
    return chained(fn, (dd, fd), iters, b)


def probe_bevencode(b, iters):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.lss import BevEncoderConvs

    x = np.random.RandomState(0).randn(b, 160, 240, 1024).astype(
        np.float32)
    model = BevEncoderConvs(256)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 1024)), train=False)
    variables = jax.device_put(jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), variables))
    xd = jax.device_put(x.astype(jnp.bfloat16))

    def fn(c, xx):
        return _live(model.apply(variables, xx + c.astype(xx.dtype),
                                 train=False))
    return chained(fn, (xd,), iters, b)


def _radar_inputs(b):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-55, 55, (b, 40000, 8)).astype(np.float32)
    pts[..., 1] = rng.uniform(-38, 38, (b, 40000))
    pts[..., 2] = rng.uniform(-2, 4, (b, 40000))
    return pts, np.ones((b, 40000), bool)


def probe_pillar_encode(b, iters, fold_bn=False):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig
    from omnihd_scenes_tpu.models.pillar_encoders import DensePillarEncoder

    pc = PointPillarsConfig()
    model = DensePillarEncoder(
        feat_channels=pc.pfn_channels, voxel_size=pc.voxel_size,
        point_cloud_range=pc.point_cloud_range, grid_hw=pc.bev_hw,
        fold_bn=fold_bn)
    pts, mask = _radar_inputs(b)
    variables = model.init(jax.random.PRNGKey(0), pts[:1, :64],
                           mask[:1, :64], False)
    variables = jax.device_put(jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), variables))
    pd = jax.device_put(pts.astype(jnp.bfloat16))
    md = jax.device_put(mask)

    def fn(c, pp, mm):
        return _live(model.apply(variables, pp + c.astype(pp.dtype), mm,
                                 False))
    return chained(fn, (pd, md), iters, b)


def probe_scatter_floor(b, iters):
    """Bare scatter/gather traffic of the dense pillar encoder.

    Times ONLY the three irreducible index ops of
    ``DensePillarEncoder`` (models/pillar_encoders.py) at the exact
    production shapes and index distribution — the per-pillar stats
    scatter-add, the means gather back to the points, and the PFN
    scatter-max onto the canvas — with no PFN matmul/BN/activation.
    ``pillar_encode`` minus this probe is the FLOP part; if this probe
    dominates, the encoder sits at the TPU scatter/gather floor and no
    kernel reformulation of the arithmetic can move it.
    """
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig

    pc = PointPillarsConfig()
    h, w = pc.bev_hw
    hw = h * w
    x0, y0 = pc.point_cloud_range[0], pc.point_cloud_range[1]
    vx, vy = pc.voxel_size[0], pc.voxel_size[1]
    pts, mask = _radar_inputs(b)
    n = pts.shape[1]
    flat = pts.reshape(b * n, -1)
    ix = np.clip(np.floor((flat[:, 0] - x0) / vx).astype(np.int32),
                 0, w - 1)
    iy = np.clip(np.floor((flat[:, 1] - y0) / vy).astype(np.int32),
                 0, h - 1)
    bidx = np.repeat(np.arange(b, dtype=np.int32), n)
    lin = bidx * hw + iy * w + ix          # all points valid here
    lin_d = jax.device_put(lin)
    feat = jax.device_put(np.ascontiguousarray(
        flat[:, :4]).astype(jnp.bfloat16))
    emb = jax.device_put(
        np.random.RandomState(1).randn(b * n, 64).astype(jnp.bfloat16))

    def fn(c, li, st, em):
        st = st + c.astype(st.dtype)
        em = em + c.astype(em.dtype)
        sums = jnp.zeros((b * hw, 4), st.dtype).at[li].add(
            st, mode='drop')
        pmean = sums[li, 1:]                       # gather back
        neg = jnp.asarray(-jnp.inf, em.dtype)
        canvas = jnp.full((b * hw, 64), neg, em.dtype).at[li].max(
            em, mode='drop')
        # Mask the untouched -inf rows so the anti-DCE carry stays
        # finite (a -inf carry would degenerate the 'perturb inputs by
        # the carry' contract to NaN arithmetic after one iteration).
        canvas = jnp.where(jnp.isfinite(canvas), canvas, 0.0)
        return _live(pmean, canvas)
    return chained(fn, (lin_d, feat, emb), iters, b)


def probe_radar(b, iters):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)
    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig

    cfg = BEVFusionConfig(camera_stream=False, lc_fusion=False, se=False,
                          pillars=PointPillarsConfig(pillar_impl='dense'))
    model = BEVFusion(cfg)
    pts, mask = _radar_inputs(b)
    variables = model.init(jax.random.PRNGKey(0), pts[:1, :64],
                           mask[:1, :64], train=False)
    variables = jax.device_put(jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == np.float32 else v,
        variables))
    pd = jax.device_put(pts.astype(jnp.bfloat16))
    md = jax.device_put(mask)

    def fn(c, pp, mm):
        out = model.apply(variables, pp + c.astype(pp.dtype), mm,
                          train=False)
        return _live(out['cls_score'], out['bbox_pred'], out['dir_pred'])
    return chained(fn, (pd, md), iters, b)


def probe_decode(b, iters):
    import jax
    import jax.numpy as jnp
    from omnihd_scenes_tpu.models.anchor_head import (DecodeCfg,
                                                      anchor_head_get_bboxes)
    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig

    pc = PointPillarsConfig()
    anchors = pc.anchors()
    rng = np.random.RandomState(0)
    h, w = 160, 240
    na = anchors.shape[-2] if anchors.ndim > 2 else 8
    cls = rng.randn(b, h, w, na * 4).astype(np.float32)
    box = rng.randn(b, h, w, na * 9).astype(np.float32) * 0.1
    dirp = rng.randn(b, h, w, na * 2).astype(np.float32)
    anc = np.ascontiguousarray(np.tile(anchors[None], (b,) + (1,)
                                       * anchors.ndim))
    cfg = DecodeCfg()
    cd, bd, dd, ad = jax.device_put((cls, box, dirp, anc))

    def fn(c, cc, bb, dd_, aa):
        cc = cc + c
        outs = jax.vmap(lambda c1, b1, d1, a1: anchor_head_get_bboxes(
            c1, b1, d1, a1, cfg))(cc, bb, dd_, aa)
        return _live(*outs)
    return chained(fn, (cd, bd, dd, ad), iters, b)


PROBES = {
    'resnet': probe_resnet,
    'stem': lambda b, i: probe_resnet(b, i, stem_only=True),
    'fpnc': probe_fpnc,
    'depthnet': probe_depthnet,
    'splat': probe_splat,
    'bevencode': probe_bevencode,
    'pillar_encode': probe_pillar_encode,
    'pillar_encode_fold': lambda b, i: probe_pillar_encode(b, i,
                                                           fold_bn=True),
    'scatter_floor': probe_scatter_floor,
    'radar': probe_radar,
    'decode': probe_decode,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--probe', default=','.join(PROBES))
    args = p.parse_args(argv)
    for name in args.probe.split(','):
        ms, ms_total = PROBES[name](args.batch, args.iters)
        print(json.dumps({'probe': name, 'batch': args.batch,
                          'ms_per_sample': round(ms, 2),
                          'ms_per_iter': round(ms_total, 2)}), flush=True)


if __name__ == '__main__':
    main()
