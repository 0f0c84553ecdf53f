"""Model registry: config -> (model, datasets, loss_fn, predict_fn).

The reference wires models through mmcv registries + config dicts
(``build_model``, ``tools/train.py:232-235``); here a ``model_type``
key selects the family and the builders assemble the jittable loss and
prediction functions:

- ``pointpillars`` / ``radarpillarnet``: single-modality pillar
  detectors (radar or lidar);
- ``lss`` / ``bevfusion`` / ``rcfusion``: camera(+radar) fusion
  detectors with optional depth supervision;
- ``bevfusion_mtl``: fusion + occupancy multi-task;
- ``bevformer``: temporal camera DETR detector.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.models.anchor_head import (DecodeCfg, HeadLossConfig,
                                                  anchor_head_decode_candidates,
                                                  anchor_head_get_bboxes,
                                                  anchor_head_loss)
from omnihd_scenes_tpu.ops.nms_host import nms_rotated_multiclass_host_batch
from omnihd_scenes_tpu.models.bevfusion import (BEVFusion, BEVFusionConfig,
                                                depth_dist_loss)
from omnihd_scenes_tpu.models.bevformer import (BEVFormerConfig,
                                                BEVFormerDetector,
                                                bevformer_head_loss)
from omnihd_scenes_tpu.models.bbox_coder import (NMSFreeCoderCfg,
                                                 nms_free_decode)
from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                PointPillarsConfig)
from omnihd_scenes_tpu.models.lss import LSSConfig
from omnihd_scenes_tpu.models.mtl import BEVFusionMTL, MTLConfig
from omnihd_scenes_tpu.models.occ_head import occ_head_loss


def build_model_from_cfg(cfg):
    """cfg.model_type + cfg.model -> flax module."""
    mtype = cfg.get('model_type', 'pointpillars')
    mdict = cfg.model.to_dict()
    if mtype in ('pointpillars', 'radarpillarnet'):
        if mtype == 'radarpillarnet':
            mdict.setdefault('with_velocity_snr_center', True)
        return PointPillars(PointPillarsConfig(**mdict)), mtype
    if mtype in ('lss', 'bevfusion', 'rcfusion', 'bevfusion_mtl'):
        lss_cfg = LSSConfig(**mdict.pop('lss', {}))
        pillars = PointPillarsConfig(**mdict.pop('pillars', {}))
        occ = {k: mdict.pop(k) for k in ('occ_classes', 'occ_dz')
               if k in mdict}
        task_w = mdict.pop('task_weights', (1.0, 1.0))
        if mtype == 'lss':
            mdict.setdefault('radar_stream', False)
            mdict.setdefault('lc_fusion', False)
            mdict.setdefault('se', False)
        if mtype == 'rcfusion':
            mdict.setdefault('rc_fusion', 'cross_attention')
        fcfg = BEVFusionConfig(lss=lss_cfg, pillars=pillars, **mdict)
        if mtype == 'bevfusion_mtl':
            return BEVFusionMTL(MTLConfig(fusion=fcfg,
                                          task_weights=tuple(task_w),
                                          **occ)), mtype
        return BEVFusion(fcfg), mtype
    if mtype == 'bevformer':
        return BEVFormerDetector(BEVFormerConfig(**mdict)), mtype
    raise ValueError(f'unknown model_type {mtype}')


def example_batch_for(model, mtype: str, cfg=None):
    """Synthetic config-scale positional inputs for one forward
    (FLOPs counting / compile checks)."""
    rng = np.random.RandomState(0)
    if mtype in ('pointpillars', 'radarpillarnet'):
        n = 20000
        pts = rng.uniform(-50, 50, (1, n, 8)).astype(np.float32)
        return (pts, np.ones((1, n), bool))
    if mtype in ('lss', 'bevfusion', 'rcfusion', 'bevfusion_mtl'):
        fcfg = model.cfg.fusion if mtype == 'bevfusion_mtl' else model.cfg
        h, w = fcfg.lss.final_dim
        nv = fcfg.num_views
        imgs = rng.randn(1, nv, h, w, 3).astype(np.float32)
        rots = np.tile(np.eye(3, dtype=np.float32) * 0.01, (1, nv, 1, 1))
        trans = np.zeros((1, nv, 3), np.float32)
        n = 20000
        pts = rng.uniform(-50, 50, (1, n, 8)).astype(np.float32)
        return (pts, np.ones((1, n), bool), imgs, rots, trans)
    if mtype == 'bevformer':
        q = model.cfg.queue_length
        nv = model.cfg.num_cams
        h, w = model.cfg.img_hw
        imgs = rng.randn(q, nv, h, w, 3).astype(np.float32)
        can_bus = np.zeros((q, 18), np.float32)
        l2i = np.tile(np.eye(4, dtype=np.float32), (q, nv, 1, 1))
        return (imgs, can_bus, l2i, np.zeros((q,), bool))
    raise ValueError(mtype)


def init_model(model, mtype: str, sample: Dict, rng_key=None):
    """Initialize variables from a single dataset sample.

    Anchor-family models are batched modules (add a leading batch dim);
    BEVFormer is a single-sample module (vmap'd by the loss fn).
    """
    import jax as _jax

    rng_key = rng_key if rng_key is not None else _jax.random.PRNGKey(0)
    if mtype == 'bevformer':
        return model.init(rng_key, sample['imgs'], sample['can_bus'],
                          sample['lidar2img'],
                          sample.get('has_prev',
                                     np.zeros(sample['imgs'].shape[0],
                                              bool)),
                          train=False)
    batch = {k: (v[None] if isinstance(v, np.ndarray) else v)
             for k, v in sample.items()}
    return model.init(rng_key, train=False,
                      **_model_inputs(batch, mtype, False))


def anchors_for(model, mtype: str):
    """Dense anchor grid for anchor-head families (None for DETR)."""
    if mtype in ('pointpillars', 'radarpillarnet'):
        return model.cfg.anchors()
    if mtype in ('lss', 'bevfusion', 'rcfusion'):
        return model.cfg.pillars.anchors()
    if mtype == 'bevfusion_mtl':
        return model.cfg.fusion.pillars.anchors()
    return None


def _model_inputs(batch: Dict, mtype: str, train: bool):
    if mtype in ('pointpillars', 'radarpillarnet'):
        return dict(points=batch['points'], points_mask=batch['points_mask'])
    if mtype in ('lss', 'bevfusion', 'rcfusion', 'bevfusion_mtl'):
        kw = dict(imgs=batch['imgs'], rots=batch['img2lidar_rots'],
                  trans=batch['img2lidar_trans'])
        if 'points' in batch:
            kw.update(points=batch['points'],
                      points_mask=batch['points_mask'])
        else:
            kw.update(points=None, points_mask=None)
        return kw
    if mtype == 'bevformer':
        return dict(imgs_queue=batch['imgs'],
                    can_bus_queue=batch['can_bus'],
                    lidar2img_queue=batch['lidar2img'],
                    has_prev_queue=batch['has_prev'])
    raise ValueError(mtype)


def make_loss_fn_generic(model, mtype: str, anchors_np: np.ndarray = None,
                         depth_loss_weight: float = 1.0,
                         camera_depth_range=(1.0, 60.0, 1.0),
                         occ_weight: float = 1.0):
    """Build ``loss_fn(params, batch_stats, batch)`` for any family."""
    head_cfg = HeadLossConfig()
    anchors = jnp.asarray(anchors_np) if anchors_np is not None else None

    def anchor_losses(out, batch):
        losses = jax.vmap(partial(anchor_head_loss, cfg=head_cfg),
                          in_axes=(0, 0, 0, None, 0, 0, 0))(
            out['cls_score'], out['bbox_pred'], out['dir_pred'], anchors,
            batch['gt_boxes'], batch['gt_labels'], batch['gt_mask'])
        return {k: jnp.mean(v) for k, v in losses.items()}

    if mtype in ('pointpillars', 'radarpillarnet'):
        def loss_fn(params, batch_stats, batch):
            out, mut = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                train=True, mutable=['batch_stats'],
                **_model_inputs(batch, mtype, True))
            aux = anchor_losses(out, batch)
            total = aux['loss_cls'] + aux['loss_bbox'] + aux['loss_dir']
            return total, (aux, mut['batch_stats'])
        return loss_fn

    if mtype in ('lss', 'bevfusion', 'rcfusion', 'bevfusion_mtl'):
        def loss_fn(params, batch_stats, batch):
            out, mut = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                train=True, mutable=['batch_stats'],
                **_model_inputs(batch, mtype, True))
            aux = anchor_losses(out, batch)
            total = aux['loss_cls'] + aux['loss_bbox'] + aux['loss_dir']
            if 'depth_gaussian' in batch and out.get('depth') is not None:
                dl = depth_dist_loss(out['depth'], batch['depth_gaussian'],
                                     batch['depth_min'],
                                     camera_depth_range)
                aux['loss_depth'] = dl
                total = total + depth_loss_weight * dl
            if mtype == 'bevfusion_mtl' and 'gt_occ' in batch:
                occ = jax.vmap(occ_head_loss)(out['occ_logits'],
                                              batch['gt_occ'])
                loss_occ = jnp.mean(occ['loss_occ'])
                loss_ssc = jnp.mean(occ['loss_ssc'])
                aux['loss_occ'] = loss_occ
                aux['loss_ssc'] = loss_ssc
                total = total + occ_weight * (loss_occ + loss_ssc)
            return total, (aux, mut['batch_stats'])
        return loss_fn

    if mtype == 'bevformer':
        def loss_fn(params, batch_stats, batch):
            def one(sample):
                out = model.apply(
                    {'params': params, 'batch_stats': batch_stats},
                    sample['imgs'], sample['can_bus'], sample['lidar2img'],
                    sample['has_prev'], train=True)
                return bevformer_head_loss(
                    out['all_cls_scores'], out['all_bbox_preds'],
                    sample['gt_boxes'], sample['gt_labels'],
                    sample['gt_mask'])
            losses = jax.vmap(one)(
                {k: batch[k] for k in ('imgs', 'can_bus', 'lidar2img',
                                       'has_prev', 'gt_boxes', 'gt_labels',
                                       'gt_mask')})
            aux = {k: jnp.mean(v) for k, v in losses.items()
                   if k in ('loss_cls', 'loss_bbox')}
            total = jnp.mean(losses['total'])
            return total, (aux, batch_stats)
        return loss_fn

    raise ValueError(mtype)


def make_predict_fn_generic(model, mtype: str, anchors_np: np.ndarray = None,
                            decode_cfg: DecodeCfg = None,
                            nms_free_cfg: NMSFreeCoderCfg = None,
                            extra_variables: dict = None,
                            host_nms: bool = False):
    """Build inference fn returning padded (boxes, scores, labels, valid)
    (+ occ argmax for MTL).

    ``extra_variables``: additional variable collections merged into
    every apply (e.g. the ``quant`` collection for the int8 tier).

    ``host_nms`` (anchor-family only): end the jitted graph at the
    top-``nms_pre`` candidate decode and run the greedy rotated NMS on
    the host (``ops/nms_host.py``, native C++ core) instead of in-graph.
    Same results (parity pinned by tests/test_nms_host.py); in a
    streaming server the host suppression overlaps the next batch's
    device step, taking ~2.5 ms/sample of sort/polygon work off the TPU
    critical path (BENCH.md round 3).
    """
    extra = extra_variables or {}
    if mtype == 'bevformer':
        cfg = nms_free_cfg or NMSFreeCoderCfg()

        def _stream_one(params, batch_stats, imgs, can_bus, lidar2img,
                        prev_bev, has_prev):
            out = model.apply({'params': params, 'batch_stats': batch_stats,
                               **extra},
                              imgs, can_bus, lidar2img, prev_bev,
                              has_prev, method=BEVFormerDetector.forward_stream)
            boxes = nms_free_decode(out['all_cls_scores'][-1],
                                    out['all_bbox_preds'][-1], cfg)
            return boxes, out['bev_embed']

        return jax.jit(_stream_one)

    decode_cfg = decode_cfg or DecodeCfg()

    @jax.jit
    def predict(params, batch_stats, batch, anchors_b):
        out = model.apply({'params': params, 'batch_stats': batch_stats,
                           **extra},
                          train=False, **_model_inputs(batch, mtype, False))
        occ_pred = (jnp.argmax(out['occ_logits'], axis=-1)
                    if mtype == 'bevfusion_mtl' else None)
        if host_nms:
            cand = jax.vmap(partial(anchor_head_decode_candidates,
                                    cfg=decode_cfg))(
                out['cls_score'], out['bbox_pred'], out['dir_pred'],
                anchors_b)
            return cand, occ_pred
        dets = jax.vmap(partial(anchor_head_get_bboxes, cfg=decode_cfg))(
            out['cls_score'], out['bbox_pred'], out['dir_pred'], anchors_b)
        return dets, occ_pred

    def predict_with_anchors(params, batch_stats, batch):
        b = next(iter(batch.values())).shape[0]
        anchors_b = np.ascontiguousarray(np.broadcast_to(
            anchors_np[None], (b,) + anchors_np.shape))
        out, occ = predict(params, batch_stats, batch, anchors_b)
        if host_nms:
            boxes, scores = (np.asarray(x) for x in out)
            out = nms_rotated_multiclass_host_batch(
                boxes, scores, decode_cfg.score_thr, decode_cfg.nms_thr,
                decode_cfg.max_num)
        return out, occ

    return predict_with_anchors


def make_tsa_overflow_probe(model, extra_variables: dict = None):
    """Jitted checkpoint guard for ``tsa_impl='windowed'`` serving.

    The windowed TSA dual zeroes any tap whose LEARNED offset leaves
    the tile window (``ops/ms_deform_attn.msda_windowed_bev``); unlike
    the SCA query cap the condition depends on trained weights and live
    inputs, so eval runners probe it on the REAL streamed state: this
    returns ``fn(params, batch_stats, imgs, can_bus, lidar2img,
    prev_bev, has_prev) -> max overflowing-tap fraction`` across all
    encoder layers (0.0 == bit-compatible with the gather path; the
    scalar is sown by ``TemporalSelfAttention``).
    """
    extra = extra_variables or {}

    def _probe(params, batch_stats, imgs, can_bus, lidar2img, prev_bev,
               has_prev):
        _, inter = model.apply(
            {'params': params, 'batch_stats': batch_stats, **extra},
            imgs, can_bus, lidar2img, prev_bev, has_prev,
            method=BEVFormerDetector.forward_stream,
            mutable=['intermediates'])
        leaves = [v for p, v in jax.tree_util.tree_leaves_with_path(
            inter['intermediates'])
            if 'tsa_window_overflow' in jax.tree_util.keystr(p)]
        assert leaves, 'model has no windowed TSA layers'
        return jnp.max(jnp.stack([jnp.max(l) for l in leaves]))

    return jax.jit(_probe)


def make_predict_stream_batched(model, nms_free_cfg=None,
                                extra_variables: dict = None):
    """Batched (scene-parallel) BEVFormer streaming inference: one
    dispatch serves B independent temporal streams (vmap over the
    per-sample streaming forward).

    ``extra_variables``: additional variable collections merged into
    every apply (e.g. the ``quant`` collection for the int8 tier).
    """
    cfg = nms_free_cfg or NMSFreeCoderCfg()
    extra = extra_variables or {}

    def _stream_one(params, batch_stats, imgs, can_bus, lidar2img,
                    prev_bev, has_prev):
        out = model.apply({'params': params, 'batch_stats': batch_stats,
                           **extra},
                          imgs, can_bus, lidar2img, prev_bev,
                          has_prev, method=BEVFormerDetector.forward_stream)
        boxes = nms_free_decode(out['all_cls_scores'][-1],
                                out['all_bbox_preds'][-1], cfg)
        return boxes, out['bev_embed']

    return jax.jit(jax.vmap(_stream_one,
                            in_axes=(None, None, 0, 0, 0, 0, 0)))
