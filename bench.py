"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): camera + 4D-radar BEVFusion inference
samples/sec/chip — full production scale (ResNet50, 6 cams at 544x960,
59 LSS depth bins, 40k radar points, rotated-NMS decode to 500 boxes).

Methodology: the model step is iterated inside ONE jit via
``lax.fori_loop`` with a data dependency between iterations, and a
single scalar readback at the end — this measures pure device time.
(Per-call timing through this environment's TPU relay is dominated by
~20-30 ms of RPC latency per dispatch and underestimates the chip by
3-10x.)

The reference publishes no throughput numbers (BASELINE.md "Notes");
``vs_baseline`` is computed against a nominal 15 samples/sec — a
BEVFusion-class camera+radar detector on an A100 — pending a measured
PyTorch reference.  The north-star ratio is 2.0 (>= 2x A100).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent TPU compile cache (remote relay compiles run 30-400 s;
# cache hits make warm re-runs start in seconds).  Must be set before
# the first jax import in this process.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

NOMINAL_A100_SAMPLES_PER_SEC = 15.0
N_ITERS = 16


def _train_bench_arm(batch: int, remat: bool,
                     remat_exclude: tuple = (), remat_parts: tuple = (),
                     shared: dict = None):
    """Build one train-bench arm: returns ``run()`` that executes one
    timed round (N_ITERS chained steps) and its samples count.  The
    first call compiles; time only subsequent calls.

    ``shared``: mutable dict caching the on-device inputs so A/B arms
    reuse ONE copy — both arms read without donation.  (params,
    opt_state, stats) are batch-independent and shared across ALL arms
    under key ``'state'``; the batch itself is cached per batch size.
    A second resident copy of params + AdamW moments + the b4 image
    batch (~1 GB) is what pushed the paired b4 A/B over HBM."""
    import jax
    import optax

    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)
    from omnihd_scenes_tpu.models.lss import LSSConfig
    from omnihd_scenes_tpu.train.amp import bf16_policy
    from omnihd_scenes_tpu.train.builder import (anchors_for,
                                                 make_loss_fn_generic)
    from omnihd_scenes_tpu.utils.rig import ring_rig_img2lidar

    cfg = BEVFusionConfig(remat=remat, remat_exclude=tuple(remat_exclude),
                          lss=LSSConfig(remat_parts=tuple(remat_parts)))
    model = BEVFusion(cfg)
    _rig_rt = ring_rig_img2lidar(img_hw=(544, 960))

    b, n_pts, max_gt = batch, 40000, 64
    rng = np.random.RandomState(0)
    bt = {
        'points': rng.uniform(-50, 50, (b, n_pts, 8)).astype(np.float32),
        'points_mask': np.ones((b, n_pts), bool),
        'imgs': rng.randn(b, 6, 544, 960, 3).astype(np.float32),
        # Realistic rig (see main()'s geometry note).
        'img2lidar_rots': np.tile(_rig_rt[0][None], (b, 1, 1, 1)),
        'img2lidar_trans': np.tile(_rig_rt[1][None], (b, 1, 1)),
        'gt_boxes': rng.uniform(-40, 40, (b, max_gt, 9)).astype(np.float32),
        'gt_labels': rng.randint(0, 4, (b, max_gt)).astype(np.int32),
        'gt_mask': np.ones((b, max_gt), bool),
    }
    bt['gt_boxes'][..., 3:6] = rng.uniform(1, 4, (b, max_gt, 3))

    loss_fn = bf16_policy(
        make_loss_fn_generic(model, 'bevfusion', anchors_for(model,
                                                             'bevfusion')))
    tx = optax.adamw(2e-4)
    state = shared.get('state') if shared is not None else None
    if state is None:
        variables = model.init(
            jax.random.PRNGKey(0), bt['points'], bt['points_mask'],
            bt['imgs'], bt['img2lidar_rots'], bt['img2lidar_trans'],
            train=False)
        state = (variables['params'], tx.init(variables['params']),
                 variables.get('batch_stats', {}))
        if shared is not None:
            shared['state'] = state
    params, opt_state, stats = state
    swap = bool(shared is not None and shared.get('swap_batches'))
    dev_batch = None
    if not swap:
        dev_batch = shared.get(batch) if shared is not None else None
        if dev_batch is None:
            dev_batch = jax.device_put(bt)
            if shared is not None:
                shared[batch] = dev_batch

    @jax.jit
    def bench_loop(p, o, s, bt):
        def body(i, carry):
            p_c, o_c, s_c = carry
            # Chain the evolving params into the (otherwise constant)
            # point cloud: voxelize touches no params, so with a fixed
            # batch XLA hoists its sort out of the loop (licm).
            eps = jax.tree.leaves(p_c)[0].ravel()[0] * 1e-30
            bt_i = dict(bt, points=bt['points'] + eps)
            (loss, (_, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p_c, s_c, bt_i)
            updates, o_n = tx.update(grads, o_c, p_c)
            return (optax.apply_updates(p_c, updates), o_n, new_stats)
        p_f, _, _ = jax.lax.fori_loop(0, N_ITERS, body, (p, o, s))
        return jax.tree.leaves(p_f)[0].ravel()[0]

    def run():
        if swap:
            # Cross-batch A/B: b4's train step needs nearly all HBM,
            # so the other arm's batch cannot stay resident.  Upload
            # this arm's batch, run the round, free it — the ~50 ms
            # transfer amortizes over a ~20 s round; the pairing still
            # holds (both arms pay the same swap inside their timed
            # window, and the ratio is what's reported).
            dev = jax.device_put(bt)
            out = float(bench_loop(params, opt_state, stats, dev))
            for leaf in jax.tree.leaves(dev):
                leaf.delete()
            return out
        return float(bench_loop(params, opt_state, stats, dev_batch))

    return run, N_ITERS * b


def main_train(batch: int = 1, remat: bool = None,
               remat_exclude: tuple = (), remat_parts: tuple = ()):
    """--train [--batch N] [--remat|--no-remat]: BEVFusion train-step
    throughput (fwd+bwd+optimizer), bf16-compute / f32-state policy,
    N steps chained inside one jit (state carried through the loop is a
    real data dependency).

    remat defaults to on for batch > 1: the un-rematted b=4 step needs
    22.7 GB of trunk activations vs 15.75 GB v5e HBM; with
    ``BEVFusionConfig(remat=True)`` the trunks recompute in the
    backward pass instead (BENCH.md round 3)."""
    if remat is None:
        remat = batch > 1
    run, samples = _train_bench_arm(batch, remat, remat_exclude,
                                    remat_parts)
    run()                                        # compile
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'bevfusion_train_step_samples_per_sec'
                  + (f'_b{batch}' if batch != 1 else ''),
        'value': round(samples / dt, 2),
        'unit': 'samples/sec/chip',
        'batch': batch,
        'remat': remat,
        'remat_exclude': list(remat_exclude),
        'remat_parts': list(remat_parts),
        'vs_baseline': None,
    }))


def _parse_ab_spec(spec: str):
    """'b4,remat,excl=second+lss,parts=depthnet' -> arm kwargs."""
    kw = {'batch': 1, 'remat': None, 'remat_exclude': (),
          'remat_parts': ()}
    for tok in filter(None, spec.split(',')):
        if tok.startswith('b') and tok[1:].isdigit():
            kw['batch'] = int(tok[1:])
        elif tok == 'remat':
            kw['remat'] = True
        elif tok == 'no-remat':
            kw['remat'] = False
        elif tok.startswith('excl='):
            kw['remat_exclude'] = tuple(tok[5:].split('+'))
        elif tok.startswith('parts='):
            kw['remat_parts'] = tuple(tok[6:].split('+'))
        else:
            raise SystemExit(f'bad --ab token {tok!r} in {spec!r}')
    if kw['remat'] is None:
        kw['remat'] = kw['batch'] > 1
    return kw


def main_train_ab(spec: str, repeats: int = 5):
    """--train --ab 'A|B' [--repeats N]: interleaved paired train A/B.

    Round-4 found ~13% session-to-session drift on this relay box
    (BENCH.md "Selective remat": same config 3.37 vs 2.94/s across
    sessions), making cross-session train A/Bs unreliable.  This runs
    the two arms ALTERNATELY in one session (A B A B ...), N repeats
    each, and reports the paired per-round deltas — drift that moves
    both arms together cancels in the pairing.

    Spec tokens: bN (batch), remat / no-remat,
    excl=trunk+trunk (remat_exclude), parts=p+p (LSS remat_parts).
    Example:
      --train --ab 'b4,remat|b4,remat,excl=second+secondfpn' --repeats 5
    """
    sa, sb = spec.split('|')
    ka, kb = _parse_ab_spec(sa), _parse_ab_spec(sb)
    shared = {}
    if ka['batch'] != kb['batch']:
        # Two different-size batches cannot both stay resident next to
        # the b4 step's activations (measured OOM); swap per round.
        shared['swap_batches'] = True
    run_a, samples_a = _train_bench_arm(**ka, shared=shared)
    run_b, samples_b = _train_bench_arm(**kb, shared=shared)
    run_a(); run_b()                             # compile both arms
    rates_a, rates_b = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); run_a()
        rates_a.append(samples_a / (time.perf_counter() - t0))
        t0 = time.perf_counter(); run_b()
        rates_b.append(samples_b / (time.perf_counter() - t0))
    ra, rb = np.asarray(rates_a), np.asarray(rates_b)
    ratios = ra / rb
    print(json.dumps({
        'metric': 'bevfusion_train_ab_paired',
        'value': round(float(np.mean(ratios)), 4),
        'unit': 'rate_ratio_a_over_b',
        'arm_a': sa, 'arm_b': sb, 'repeats': repeats,
        'a_samples_per_sec': [round(float(x), 3) for x in ra],
        'b_samples_per_sec': [round(float(x), 3) for x in rb],
        'paired_ratios': [round(float(x), 4) for x in ratios],
        'ratio_mean': round(float(np.mean(ratios)), 4),
        'ratio_std': round(float(np.std(ratios)), 4),
        'vs_baseline': None,
    }))


def main_bevformer(batch: int = 1, sca_cap: float = 0.375,
                   r101: bool = False, tsa_impl: str = 'gather'):
    """--bevformer [--batch N]: temporal camera-only flagship
    (BEVFormer-T R50 at production scale) streaming inference.

    batch=1 is the latency mode: one scene stream, per frame the model
    consumes the previous BEV (history replay) and emits 300 NMS-free
    detections; N frames are chained inside one jit through the
    recurrent bev state (a real temporal data dependency, exactly the
    deployment access pattern).  batch>1 is the scene-parallel serving
    mode (the eval runner's ``run_streaming_inference_batched`` shape):
    B independent temporal streams advance in lockstep in one dispatch
    — reported value is aggregate samples/sec across the B streams."""
    import jax
    import jax.numpy as jnp

    from omnihd_scenes_tpu.models.bbox_coder import NMSFreeCoderCfg
    from omnihd_scenes_tpu.models.bevformer.detector import (
        BEVFormerConfig, BEVFormerDetector)
    from omnihd_scenes_tpu.train.builder import make_predict_fn_generic
    from omnihd_scenes_tpu.utils.rig import ring_rig_lidar2img

    # Production scale (R50, 160x240 BEV).  Serving uses the static
    # per-camera SCA query capacity — lossless for the omnidirectional
    # rig (max measured per-camera hit fraction < 0.30,
    # tests/test_sca_cap.py) and cuts the deformable-attention gather
    # rows (the measured bottleneck, BENCH.md) by ~1/cap.
    if r101:
        # Model-zoo R101-DCN row (reference
        # configs/bevformer_NewScenes/bevformer_T_R101.py: x0.8 images
        # 1920x1080 -> 1536x864, DCNv2 on stages 3-4).  VERDICT r4 #3:
        # this config had never been compiled or benched on the chip.
        cfg = BEVFormerConfig(sca_query_cap=sca_cap, resnet_depth=101,
                              stage_with_dcn=(False, False, True, True),
                              img_hw=(864, 1536), tsa_impl=tsa_impl)
    else:
        cfg = BEVFormerConfig(sca_query_cap=sca_cap, tsa_impl=tsa_impl)
    if batch > 1:
        # Preflight: tap tensors scale linearly with the stream count;
        # b4 at production scale is measured to CRASH the TPU worker
        # (not a clean RESOURCE_EXHAUSTED).  Refuse with a message.
        from omnihd_scenes_tpu.models.bevformer.detector import (
            check_stream_batch_fits)
        try:
            check_stream_batch_fits(cfg, batch)
        except ValueError as e:
            print(f'# refused: {e}', file=sys.stderr)
            print(json.dumps({
                'metric': 'bevformer_t_stream_infer_samples_per_sec',
                'value': None, 'unit': 'samples/sec/chip',
                'batch': batch,
                'error': 'hbm_preflight_refused',
            }))
            return
    model = BEVFormerDetector(cfg)
    b = batch

    rng = np.random.RandomState(0)
    imgs = rng.randn(b, cfg.num_cams, *cfg.img_hw, 3).astype(np.float32)
    can_bus = np.zeros((b, 18), np.float32)
    # Realistic surround-rig geometry (static per rig, like rots/trans
    # in the fusion bench): gives the bev_mask its production hit
    # pattern instead of the degenerate identity projection.
    l2i = np.tile(ring_rig_lidar2img(img_hw=cfg.img_hw)[None],
                  (b, 1, 1, 1))
    bev_shape = (cfg.bev_h * cfg.bev_w, cfg.embed_dims)
    prev_bev = np.zeros((b,) + bev_shape, np.float32)

    variables = model.init(jax.random.PRNGKey(0), imgs[0], can_bus[0],
                           l2i[0], prev_bev[0], np.asarray(False),
                           method=BEVFormerDetector.forward_stream)
    predict_one = make_predict_fn_generic(model, 'bevformer')
    predict = jax.vmap(predict_one,
                       in_axes=(None, None, 0, 0, 0, 0, None))

    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, 'dtype') and x.dtype == np.float32 else x, tree)

    params = jax.device_put(to_bf16(variables['params']))
    stats = jax.device_put(to_bf16(variables.get('batch_stats', {})))
    dev = jax.device_put(to_bf16((imgs, can_bus, l2i, prev_bev)))

    @jax.jit
    def bench_loop(p, s, im, cb, li, bev0):
        def body(i, bev):
            # Chain the carry into the images too: a loop-invariant
            # `im` lets XLA hoist the whole R50 backbone out of the
            # timing loop (see main()'s licm note).
            im_i = im + bev.ravel()[0].astype(im.dtype) * 1e-30
            boxes, new_bev = predict(p, s, im_i, cb, li, bev,
                                     jnp.asarray(True))
            # Fold the decode outputs into the carry so XLA cannot
            # dead-code-eliminate the NMS-free decode being measured.
            probe = sum(jnp.sum(l).astype(jnp.float32)
                        for l in jax.tree.leaves(boxes))
            return (new_bev + (probe * 1e-30).astype(new_bev.dtype)
                    ).astype(bev.dtype)
        bev = jax.lax.fori_loop(0, N_ITERS, body, bev0)
        return bev.ravel()[0].astype(jnp.float32)

    float(bench_loop(params, stats, *dev))   # compile
    t0 = time.perf_counter()
    float(bench_loop(params, stats, *dev))
    dt = time.perf_counter() - t0
    sps = N_ITERS * b / dt
    print(json.dumps({
        'metric': ('bevformer_t_r101dcn_stream_infer_samples_per_sec'
                   if r101 else
                   'bevformer_t_stream_infer_samples_per_sec'),
        'value': round(sps, 2),
        'unit': 'samples/sec/chip',
        'batch': b,
        'tsa_impl': tsa_impl,
        # NOMINAL yardstick (BASELINE.md "BEVFormer-T throughput
        # yardstick"): paper 1.7 FPS V100 for BEVFormer-base, scaled to
        # this config and A100-class ≈ 5 samples/s.
        'baseline': 'nominal_a100_5_samples_per_sec_paper_scaled',
        'vs_baseline': round(sps / 5.0, 3),
    }))


def main_host_real(n_samples: int = 24):
    """--host-real: real-JPEG host-pipeline budget (VERDICT r4 #8).

    Round 4 measured the host pipeline only on synthetic ARRAYS
    (BENCH.md "Host data pipeline": 57.8/s inline); real serving feeds
    six 1080p JPEGs per frame and the decode cost was uncharacterized.
    This generates a synthetic dataroot whose cameras are REAL
    1920x1080 JPEG files, then measures, through the production
    pipeline (decode -> cached-undistort -> front/back halving ->
    0.5 scale -> normalize -> pad -> radar multisweep):

      * jpeg_decode_only: cv2.imread of the 6 files;
      * dataset_inline: full dataset[i] on the calling thread;
      * loader_workers2: TrainLoader with a 2-process worker pool.

    Chip demand at the 18.6/s b4 headline is ~9 ms/frame-set of host
    budget per core; the verdict row below records what 1 core does.
    """
    import os
    import shutil

    from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
    from omnihd_scenes_tpu.data.loader import TrainLoader
    from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
    from omnihd_scenes_tpu.devkit.synthetic import (SyntheticConfig,
                                                    generate)

    root = '/tmp/omnihd_host_bench_1080p_dist'
    marker = os.path.join(root, '.done')
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        # Nonzero lens distortion so the bench pays the real rig's
        # undistort remap (real data always has it; zero-distortion
        # synthetic would silently skip that branch).
        generate(root, 'v1.0-mini',
                 SyntheticConfig(n_scenes=2, samples_per_scene=6,
                                 image_hw=(1080, 1920),
                                 cam_distortion=(-0.3, 0.1, 0.0, 0.0,
                                                 0.0)))
        create_newscenes_infos(root, root, 'synth', version='v1.0-mini',
                               max_sweeps=2)
        open(marker, 'w').close()

    ds = NewScenesDetDataset(
        ann_file=os.path.join(root, 'synth_infos_temporal_train.pkl'),
        modality='radar', max_points=40000, radar_sweeps=3,
        use_camera=True, image_target_hw=(544, 960), test_mode=True)
    ds_fast = NewScenesDetDataset(
        ann_file=os.path.join(root, 'synth_infos_temporal_train.pkl'),
        modality='radar', max_points=40000, radar_sweeps=3,
        use_camera=True, image_target_hw=(544, 960), test_mode=True,
        image_fast_decode=True)

    import cv2
    info = ds.infos[0]
    paths = [c['data_path'] for c in info['cams'].values()]
    t0 = time.perf_counter()
    reps = max(1, n_samples // len(ds))
    for _ in range(4):
        for p in paths:
            img = cv2.imread(p)
    decode_s = (time.perf_counter() - t0) / 4
    assert img is not None and img.shape[:2] == (1080, 1920), img.shape

    t0 = time.perf_counter()
    for i in range(n_samples):
        ds[i % len(ds)]
    inline = n_samples / (time.perf_counter() - t0)

    ds_fast[0]                                 # build+cache fused maps
    t0 = time.perf_counter()
    for i in range(n_samples):
        ds_fast[i % len(ds_fast)]
    inline_fast = n_samples / (time.perf_counter() - t0)

    loader = TrainLoader(ds, 2, seed=0, num_workers=2)
    for batch in loader:                       # warm the pool
        break
    t0 = time.perf_counter()
    seen = 0
    while seen < n_samples:
        loader.set_epoch(seen)
        for batch in loader:
            seen += len(batch['points'])
            if seen >= n_samples:
                break
    pooled = n_samples / (time.perf_counter() - t0)

    loader_f = TrainLoader(ds_fast, 2, seed=0, num_workers=2)
    for batch in loader_f:                     # warm the pool
        break
    t0 = time.perf_counter()
    seen = 0
    while seen < n_samples:
        loader_f.set_epoch(seen)
        for batch in loader_f:
            seen += len(batch['points'])
            if seen >= n_samples:
                break
    pooled_fast = n_samples / (time.perf_counter() - t0)

    print(json.dumps({
        'metric': 'host_pipeline_real_jpeg_samples_per_sec',
        'value': round(pooled_fast, 2),
        'unit': 'samples/sec (6x1080p JPEG frames)',
        'jpeg_decode_only_ms_per_frameset': round(decode_s * 1000, 1),
        'dataset_inline_samples_per_sec': round(inline, 2),
        'dataset_inline_fast_decode_samples_per_sec': round(
            inline_fast, 2),
        'loader_workers2_samples_per_sec': round(pooled, 2),
        'loader_workers2_fast_decode_samples_per_sec': round(
            pooled_fast, 2),
        'chip_demand_samples_per_sec': 18.59,
        'vs_baseline': None,
    }))


def main(int8: bool = False, batch: int = 1, host_nms: bool = False,
         mtl: bool = False, s2d: bool = False,
         pillar_impl: str = 'dense'):
    import jax
    import jax.numpy as jnp

    from omnihd_scenes_tpu.models import quant
    from omnihd_scenes_tpu.models.anchor_head import (
        DecodeCfg, anchor_head_decode_candidates, anchor_head_get_bboxes)
    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)
    from omnihd_scenes_tpu.ops.nms_host import (
        nms_rotated_multiclass_host_batch)

    from omnihd_scenes_tpu.models.detectors import PointPillarsConfig

    # Full-scale flagship in its serving configuration: the sort-free
    # dense pillar path (checkpoint-compatible with the 'sorted'
    # training path; parity tested in tests/test_dense_pillars.py,
    # measured 2.7 vs 4.5 ms/sample on v5e — BENCH.md round 3).
    cfg = BEVFusionConfig(
        # --pillar-fold additionally folds the frozen PFN BN+ReLU
        # through the scatter-max and drops the per-point means
        # gather-back (models/pillar_encoders.py fold_bn docs).
        pillars=PointPillarsConfig(pillar_impl=pillar_impl),
        # --s2d: space-to-depth packed serving input contract — the
        # host pipeline ships (B,6,272,480,12) images and the backbone
        # runs the exact folded 4x4/s1 stem (models/resnet.py:_S2DStem;
        # identity rewrite, tests/test_stem_s2d.py).  The device never
        # sees a 3-channel conv.
        stem_s2d=s2d)
    if mtl:
        # --mtl: the occupancy headline (SURVEY §6: BEVFusion-OCC,
        # 240x160x16 @ 0.5 m, 11 classes + free) — fusion trunk +
        # joint detection + occupancy heads, occ argmax in-graph.
        from omnihd_scenes_tpu.models.mtl import BEVFusionMTL, MTLConfig
        model = BEVFusionMTL(MTLConfig(fusion=cfg))
        host_nms = False               # in-graph decode only
    else:
        model = BEVFusion(cfg)

    n_pts, b = 40000, batch
    rng = np.random.RandomState(0)
    points = rng.uniform(-55, 55, size=(b, n_pts, 8)).astype(np.float32)
    points[..., 1] = rng.uniform(-38, 38, size=(b, n_pts))
    points[..., 2] = rng.uniform(-2, 4, size=(b, n_pts))
    mask = np.ones((b, n_pts), dtype=bool)
    imgs = rng.randn(b, 6, 544, 960, 3).astype(np.float32)
    if s2d:
        from omnihd_scenes_tpu.models.resnet import space_to_depth_np
        imgs = space_to_depth_np(imgs)     # host-side packing (free in
        #                                    the real pipeline's pad pass)
    # Realistic surround-rig geometry (static per rig; same honesty
    # fix the bevformer bench got in round 3 — a degenerate eye*0.01
    # projection gives the view transform an unrepresentative validity
    # pattern).  FLOP count is geometry-independent (one-hot dots), so
    # the throughput comparison to earlier rounds stays valid.
    from omnihd_scenes_tpu.utils.rig import ring_rig_img2lidar
    rig_rots, rig_trans = ring_rig_img2lidar(img_hw=(544, 960))
    rots = np.tile(rig_rots[None], (b, 1, 1, 1))
    trans = np.tile(rig_trans[None], (b, 1, 1))

    variables = model.init(jax.random.PRNGKey(0), points, mask,
                           imgs, rots, trans, train=False)
    anchors_np = cfg.pillars.anchors()
    anchors_b = np.ascontiguousarray(
        np.tile(anchors_np[None], (b,) + (1,) * anchors_np.ndim))
    decode_cfg = DecodeCfg()         # nms_pre=1000, max_num=500

    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, 'dtype') and x.dtype == np.float32 else x, tree)

    # bf16 deployment precision: conv/matmul compute in bf16 (2x MXU
    # throughput, halved HBM traffic); box decode + NMS stay f32.
    # --int8 adds the PTQ tier on top: conv trunks run s8xs8->s32
    # (2x the bf16 MXU rate on v5e) with scales calibrated here.
    params = jax.device_put(to_bf16(variables['params']))
    stats = jax.device_put(to_bf16(variables.get('batch_stats', {})))
    dev_in = jax.device_put(to_bf16((points, mask, imgs, rots, trans,
                                     anchors_b)))

    quant_vars = {}
    if int8:
        quant.set_mode('calib')
        # jit the calibration pass: eager apply through the axon relay
        # is one RPC per op and takes tens of minutes.
        calib = jax.jit(lambda v, *xs: model.apply(
            v, *xs, train=False, mutable=['quant'])[1])
        muts = jax.device_get(
            calib({'params': params, 'batch_stats': stats}, *dev_in[:5]))
        quant.set_mode('freeze')
        freeze = jax.jit(lambda v, *xs: model.apply(
            v, *xs, train=False, mutable=['quant'])[1])
        muts = jax.device_get(
            freeze({'params': params, 'batch_stats': stats,
                    'quant': muts['quant']}, *dev_in[:5]))
        quant_vars = {'quant': jax.device_put(muts['quant'])}
        quant.set_mode('int8')

    if host_nms:
        from omnihd_scenes_tpu.data.native import native_available
        if not native_available():
            # The NumPy NMS fallback is ~400x the native core — fine
            # for correctness (tools/test.py), catastrophic in a
            # throughput bench.  Fall back to the in-graph decode.
            print('# host-NMS: native lib unavailable, using in-graph '
                  'NMS', file=sys.stderr)
            host_nms = False
    if host_nms:
        # Pipelined serving decode: the jitted graph ends at the
        # top-nms_pre candidate decode; the greedy rotated NMS runs on
        # the host (ops/nms_host.py, native C++) overlapped with the
        # next chunk's device step — JAX dispatch is asynchronous, so
        # while the device computes chunk i the host suppresses chunk
        # i-1 (~0.8 MB/chunk copied back).  Results are identical to
        # the in-graph path (tests/test_nms_host.py); timing below is
        # honest steady state: the clock stops after the LAST chunk's
        # host NMS completes.  MEASURED NET LOSS on this box (BENCH.md
        # round 3): 16.1 vs 18.25/s in-graph.  Decomposition: the
        # chunked harness floor (host NMS skipped) is 17.75 — scan
        # stacking + per-chunk dispatch/transfer eat the 2.5 ms/sample
        # the decode removal saves — and the NMS itself (~33 ms/sample
        # at the random-weights worst case, C++ with the GIL released)
        # costs another 1.7/s because this bench box has ONE core: the
        # suppression starves the axon relay client's feeder threads,
        # so the device idles.  Kept as an opt-in (--host-nms) for
        # multi-core serving hosts, where the device step is the only
        # critical path.
        chunk = int(os.environ.get('OMNIHD_BENCH_CHUNK', '4'))
        skip_host = os.environ.get('OMNIHD_BENCH_SKIP_HOST_NMS') == '1'
        assert N_ITERS % chunk == 0, (
            f'chunk={chunk} must divide N_ITERS={N_ITERS}: the '
            'samples/sec denominator assumes every iteration ran')
        n_chunks = N_ITERS // chunk

        @jax.jit
        def chunk_fn(p, s, qv, carry0, pts, msk, im, r, t, anc):
            def body(carry, _):
                # Chain the carry into EVERY per-sample input (licm
                # honesty, see the in-graph branch below); chunks chain
                # through the carry scalar so device work serializes
                # exactly like one long loop.
                im_i = im + carry * 1e-30
                pts_i = pts + carry * 1e-30
                out = model.apply({'params': p, 'batch_stats': s, **qv},
                                  pts_i, msk, im_i, r, t, train=False)
                boxes, scores = jax.vmap(
                    lambda c, b, d, a: anchor_head_decode_candidates(
                        c.astype(jnp.float32), b.astype(jnp.float32),
                        d.astype(jnp.float32), a.astype(jnp.float32),
                        decode_cfg))(
                    out['cls_score'], out['bbox_pred'], out['dir_pred'],
                    anc)
                return jnp.sum(scores).astype(jnp.bfloat16), (boxes, scores)
            return jax.lax.scan(body, carry0, None, length=chunk)

        def run_pipeline():
            carry = jnp.bfloat16(0)
            prev = None
            for _ in range(n_chunks):
                carry, cands = chunk_fn(params, stats, quant_vars, carry,
                                        *dev_in)          # async dispatch
                if prev is not None:
                    _host_nms_chunk(prev)  # overlaps the running chunk
                prev = cands
            _host_nms_chunk(prev)
            return carry

        def _host_nms_chunk(cands):
            boxes, scores = (np.asarray(x) for x in cands)  # blocks on dev
            if skip_host:
                return                # diagnostic: pipeline harness floor
            for f in range(chunk):
                nms_rotated_multiclass_host_batch(
                    boxes[f], scores[f], decode_cfg.score_thr,
                    decode_cfg.nms_thr, decode_cfg.max_num)

        float(run_pipeline())               # compile + warm
        t0 = time.perf_counter()
        float(run_pipeline())
        dt = time.perf_counter() - t0
    else:
        @jax.jit
        def bench_loop(p, s, qv, pts, msk, im, r, t, anc):
            def body(i, carry):
                # Chain the carry into EVERY per-sample input: a branch
                # fed only loop-invariant operands gets hoisted out of
                # the while loop by XLA's licm and amortized over
                # N_ITERS — chaining only `im` silently excluded the
                # whole radar branch (~4 ms/sample) from rounds 1-2
                # numbers.  rots/trans stay invariant deliberately:
                # static rig calibration is legitimately precomputed in
                # serving.
                im_i = im + carry * 1e-30
                pts_i = pts + carry * 1e-30
                out = model.apply({'params': p, 'batch_stats': s, **qv},
                                  pts_i, msk, im_i, r, t, train=False)
                boxes, scores, labels, valid = jax.vmap(
                    lambda c, b, d, a: anchor_head_get_bboxes(
                        c.astype(jnp.float32), b.astype(jnp.float32),
                        d.astype(jnp.float32), a.astype(jnp.float32),
                        decode_cfg))(
                    out['cls_score'], out['bbox_pred'], out['dir_pred'],
                    anc)
                live = jnp.sum(scores)
                if mtl:
                    # Keep the occupancy branch live (XLA dead-code-
                    # eliminates unread output leaves — BENCH.md r3).
                    occ_pred = jnp.argmax(out['occ_logits'], axis=-1)
                    live = live + jnp.sum(occ_pred).astype(live.dtype)
                return live.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, N_ITERS, body, jnp.bfloat16(0))

        # Warmup / compile.
        float(bench_loop(params, stats, quant_vars, *dev_in))

        t0 = time.perf_counter()
        float(bench_loop(params, stats, quant_vars, *dev_in))
        dt = time.perf_counter() - t0

    samples_per_sec = N_ITERS * b / dt
    print(json.dumps({
        'metric': ('bevfusion_mtl_od_occ' if mtl else 'bevfusion_cam_radar')
                  + '_infer_samples_per_sec'
                  + ('_int8' if int8 else '')
                  + ('_s2d' if s2d else '')
                  + (f'_b{b}' if b != 4 else ''),
        'value': round(samples_per_sec, 2),
        'unit': 'samples/sec/chip',
        'batch': b,
        'decode': 'host_pipelined' if host_nms else 'in_graph',
        # NOMINAL baseline (no measured A100 reference exists;
        # BASELINE.md "Notes"): 15 samples/s A100-class assumption.
        'baseline': 'nominal_a100_15_samples_per_sec',
        # Round-3 harness fix: earlier rounds let XLA hoist the
        # loop-invariant radar branch out of the timing loop, inflating
        # their headline ~1 sample/s (BENCH.md "licm").  Not comparable
        # to BENCH_r01/r02 values without that correction.
        'harness': 'licm_fixed_r3',
        'vs_baseline': round(samples_per_sec / NOMINAL_A100_SAMPLES_PER_SEC,
                             3),
    }))


def _argv_value(flag: str):
    """Value following `flag` in sys.argv, with a usage error instead
    of an IndexError when the flag is passed last."""
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv):
        raise SystemExit(f'usage: {flag} <value>')
    return sys.argv[i + 1]


if __name__ == '__main__':
    if '--host-real' in sys.argv:
        main_host_real()
        sys.exit(0)
    if '--train' in sys.argv and '--ab' in sys.argv:
        reps = int(_argv_value('--repeats')) if '--repeats' in sys.argv \
            else 5
        main_train_ab(_argv_value('--ab'), repeats=reps)
        sys.exit(0)
    if '--train' in sys.argv:
        b = 1
        if '--batch' in sys.argv:
            b = int(_argv_value('--batch'))
        remat = None
        if '--remat' in sys.argv:
            remat = True
        elif '--no-remat' in sys.argv:
            remat = False
        # Selective remat (BENCH.md "Selective remat"): trunks to keep
        # un-rematted, e.g. --remat-exclude second,secondfpn,lss
        # --remat-parts depthnet (remat only DepthNet inside LSS).
        excl = ()
        if '--remat-exclude' in sys.argv:
            excl = tuple(_argv_value('--remat-exclude').split(','))
        parts = ()
        if '--remat-parts' in sys.argv:
            parts = tuple(_argv_value('--remat-parts').split(','))
        main_train(batch=b, remat=remat, remat_exclude=excl,
                   remat_parts=parts)
    elif '--bevformer' in sys.argv:
        b = 1                  # latency mode; --batch N = scene-parallel
        if '--batch' in sys.argv:
            b = int(_argv_value('--batch'))
        cap = 0.375            # --sca-cap 1.0 = masked-dense control
        if '--sca-cap' in sys.argv:
            cap = float(_argv_value('--sca-cap'))
        # Serving default: tile-local windowed one-hot dual (2.09 ->
        # 4.10 samples/s, BENCH.md r5).  Exact at the deformable-DETR
        # init used here; per-checkpoint exactness is guarded in real
        # serving by make_tsa_overflow_probe.  --tsa gather = control.
        tsa = 'windowed'
        if '--tsa' in sys.argv:
            tsa = _argv_value('--tsa')
        main_bevformer(batch=b, sca_cap=cap, r101='--r101' in sys.argv,
                       tsa_impl=tsa)
    else:
        b = 4                  # serving batch (b=8 exceeds HBM;
        #                          b=1 latency mode via --batch 1)
        if '--batch' in sys.argv:
            b = int(_argv_value('--batch'))
        # --host-nms: measure the pipelined host-NMS decode instead of
        # the in-graph default.  MEASURED NET LOSS on this 1-core relay
        # box (16.1 vs 18.25/s, BENCH.md round 3): the C++ suppression
        # starves the relay client's feeder thread of CPU, so the
        # device idles; the mode pays only on multi-core serving hosts.
        # --mtl: the occupancy headline (joint OD+OCC flagship).
        main(int8='--int8' in sys.argv, batch=b,
             host_nms='--host-nms' in sys.argv,
             mtl='--mtl' in sys.argv,
             s2d='--s2d' in sys.argv,
             pillar_impl=('dense_fold' if '--pillar-fold' in sys.argv
                          else 'dense'))
