"""Detection experiment assembly: config -> dataset/model/loss/eval.

The glue the reference spreads across ``tools/train.py``,
``custom_train_detector`` and the mm-registry configs, condensed: a
config dict selects the PointPillars variant, and this module builds the
jittable loss/predict functions plus the devkit-eval hook.
"""

from __future__ import annotations

import os.path as osp
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
from omnihd_scenes_tpu.data.loader import EvalLoader, TrainLoader
from omnihd_scenes_tpu.train.config import Config
from omnihd_scenes_tpu.models.anchor_head import (DecodeCfg, HeadLossConfig,
                                                  anchor_head_get_bboxes,
                                                  anchor_head_loss)
from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                PointPillarsConfig)
from omnihd_scenes_tpu.parallel.mesh import shard_batch


def build_model(cfg) -> PointPillars:
    model_cfg = PointPillarsConfig(**cfg.model.to_dict())
    return PointPillars(model_cfg)


def build_dataset_single(ds_cfg, dataset_type: str = 'det'):
    kwargs = ds_cfg.to_dict() if hasattr(ds_cfg, 'to_dict') else dict(ds_cfg)
    kwargs.pop('wrapper', None)    # consumed by the caller (sampling.wrap_dataset)
    if dataset_type == 'temporal':
        from omnihd_scenes_tpu.data.temporal_dataset import (
            TemporalNewScenesDataset)

        return TemporalNewScenesDataset(**kwargs)
    return NewScenesDetDataset(**kwargs)


def build_datasets(cfg):
    dtype = cfg.get('dataset_type', 'det')
    train_ds = build_dataset_single(cfg.data.train, dtype)
    val_ds = build_dataset_single(cfg.data.val, dtype)
    return train_ds, val_ds


def make_loss_fn(model: PointPillars, head_cfg: HeadLossConfig = None):
    head_cfg = head_cfg or HeadLossConfig(
        num_classes=model.cfg.num_classes)
    anchors = jnp.asarray(model.cfg.anchors())

    def loss_fn(params, batch_stats, batch):
        out, mut = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            batch['points'], batch['points_mask'], train=True,
            mutable=['batch_stats'])
        losses = jax.vmap(partial(anchor_head_loss, cfg=head_cfg),
                          in_axes=(0, 0, 0, None, 0, 0, 0))(
            out['cls_score'], out['bbox_pred'], out['dir_pred'], anchors,
            batch['gt_boxes'], batch['gt_labels'], batch['gt_mask'])
        loss_cls = jnp.mean(losses['loss_cls'])
        loss_bbox = jnp.mean(losses['loss_bbox'])
        loss_dir = jnp.mean(losses['loss_dir'])
        total = loss_cls + loss_bbox + loss_dir
        aux = {'loss_cls': loss_cls, 'loss_bbox': loss_bbox,
               'loss_dir': loss_dir,
               'num_pos': jnp.mean(losses['num_pos'].astype(jnp.float32))}
        return total, (aux, mut['batch_stats'])

    return loss_fn


def make_predict_fn(model: PointPillars, decode_cfg: DecodeCfg = None,
                    extra_variables: Dict = None):
    """``extra_variables``: additional variable collections merged into
    the apply (e.g. the ``quant`` collection for the int8 tier)."""
    decode_cfg = decode_cfg or DecodeCfg()
    anchors_np = model.cfg.anchors()
    extra = extra_variables or {}

    @jax.jit
    def predict(params, batch_stats, points, points_mask, anchors_b):
        out = model.apply({'params': params, 'batch_stats': batch_stats,
                           **extra},
                          points, points_mask, train=False)
        return jax.vmap(partial(anchor_head_get_bboxes, cfg=decode_cfg))(
            out['cls_score'], out['bbox_pred'], out['dir_pred'], anchors_b)

    def predict_with_anchors(params, batch_stats, points, points_mask):
        # Anchors are materialized per batch and passed as a *batched*
        # argument: gathering from an unbatched vmap constant hits a
        # pathologically slow path on this backend.
        b = points.shape[0]
        anchors_b = np.broadcast_to(
            anchors_np[None], (b,) + anchors_np.shape)
        return predict(params, batch_stats, points, points_mask,
                       np.ascontiguousarray(anchors_b))

    return predict_with_anchors


def run_inference(predict_fn, state, dataset, batch_size: int,
                  mesh=None) -> List[Dict]:
    """Batched inference -> per-sample result dicts in dataset order."""
    loader = EvalLoader(dataset, batch_size)
    results = [None] * len(dataset)
    for batch, valid in loader:
        indices = batch['index']
        if mesh is not None and batch_size % mesh.devices.size == 0:
            batch = shard_batch({'points': batch['points'],
                                 'points_mask': batch['points_mask']}, mesh)
        boxes, scores, labels, det_valid = predict_fn(
            state.params, state.batch_stats,
            batch['points'], batch['points_mask'])
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        det_valid = np.asarray(det_valid)
        for i, ok in enumerate(valid):
            if ok:
                results[int(indices[i])] = {
                    'boxes': boxes[i], 'scores': scores[i],
                    'labels': labels[i], 'valid': det_valid[i]}
    return results


def make_eval_fn(cfg, model, val_dataset, mesh=None):
    decode_cfg = DecodeCfg(**cfg.get('test_cfg', Config({})).to_dict()) \
        if 'test_cfg' in cfg else DecodeCfg()
    predict_fn = make_predict_fn(model, decode_cfg)

    def eval_fn(state) -> Dict[str, float]:
        results = run_inference(predict_fn, state, val_dataset,
                                cfg.data.samples_per_device, mesh)
        return val_dataset.evaluate(
            results,
            dataroot=cfg.dataroot,
            version=cfg.version,
            eval_set=cfg.eval_set,
            jsonfile_prefix=osp.join(cfg.work_dir, 'eval'))

    return eval_fn
